package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape and semantics assertions for the warehouse (q74–q77) and
  * retrieval/layout (q78–q81) queries, guarding the physical forms their
  * 100 TB stories depend on. */
class WarehouseLayoutSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q74 SCD2 runs both windows over ONE exchange+sort pair") {
    // the change-point filter preserves (user_id, ts, event_id) order, so
    // the LEAD window must reuse the LAG window's partitioning and sort;
    // a second Sort would double the shuffle cost of every SCD2 build
    val p = plan("q74_scd2_history")
    val sorts = "(?<!Partial)Sort ".r.findAllIn(p).size
    assert(sorts <= 2, s"expected window sort + output sort only, got $sorts:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one hash exchange on user_id, got $exchanges:\n$p")
  }

  test("q77 salted join keeps its shuffled hash join on (user_id, salt)") {
    val p = plan("q77_skew_salted_join")
    assert(p.contains("ShuffledHashJoin"), s"salted join lost its exchange (broadcast would bypass the salt):\n$p")
    assert(p.contains("salt"), s"salt column missing from plan:\n$p")
  }

  test("q78 BM25 ranks via the bounded top-k aggregate, not a window sort") {
    // a window row_number would shuffle and sort the full (doc, term)
    // score stream; the bounded aggregate carries 3 rows per doc
    val p = plan("q78_bm25_topk")
    assert(!p.contains("Window"), s"BM25 fell back to a window sort of the term stream:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"corpus-stats attach fell back to a nested loop:\n$p")
  }

  test("q79 chunk-frequency join holds its shuffle-hash strategy") {
    val p = plan("q79_chunk_dedup")
    assert(p.contains("ShuffledHashJoin"), s"chunk hash join lost shuffle-hash:\n$p")
    assert(!p.contains("LocalTableScan"), s"driver-local data in plan:\n$p")
  }

  test("q80 z-order bucketing is a projection: no exchange before the aggregate") {
    // the z-value and bucket are pure row-local arithmetic; the only
    // exchanges are the aggregate's own and the output sort — a global
    // sort (ntile-style bucketing) would single-task at scale
    val p = plan("q80_zorder_layout")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"z-bucketing should shuffle only for agg + output sort, got $exchanges:\n$p")
  }

  test("q81 sketch merge plans without nested-loop joins") {
    val p = plan("q81_hll_sketch_merge")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"1-row attach fell back to a nested loop:\n$p")
  }

  test("q80 z-buckets cover disjoint tight rectangles (the data-skipping property)") {
    import spark.implicits._
    val rows = SparkEntry.queries("q80_zorder_layout")(spark, dir)
      .select($"zbucket", $"min_px", $"max_px", $"min_ox", $"max_ox")
      .collect()
    // interleaving the high bits first means each of the 32 buckets spans
    // at most a 1/4 x 1/8 slice of the (px, ox) grid (256 wide each):
    // px range <= 64, ox range <= 32 within any bucket
    rows.foreach { r =>
      val (pxr, oxr) = (r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3))
      assert(pxr <= 63 && oxr <= 31,
        s"bucket ${r.getLong(0)} rectangle too wide: px=$pxr ox=$oxr")
    }
  }

  test("q75 funnel stages are monotonically non-increasing") {
    val users = SparkEntry.queries("q75_funnel_window")(spark, dir)
      .orderBy("stage_idx").collect().map(_.getAs[Long]("users"))
    assert(users.length == 3)
    assert(users.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel grew downstream: ${users.toSeq}")
  }

  test("q74 SCD2 intervals tile each user's timeline without overlap") {
    import spark.implicits._
    val bad = SparkEntry.queries("q74_scd2_history")(spark, dir)
      .selectExpr("user_id", "version", "valid_from_us", "valid_to_us",
        "lead(valid_from_us) over (partition by user_id order by version) as next_from")
      .where("valid_to_us is not null and valid_to_us != next_from")
      .count()
    assert(bad == 0, s"$bad SCD2 intervals do not abut their successor")
  }

  test("q231 attainment curves are monotone and bounded") {
    val rows = SparkEntry.queries("q231_sla_attainment")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[Double]("within_30d"),
        r.getAs[Double]("within_60d"), r.getAs[Double]("within_90d"))
      assert(a <= b && b <= c && c <= 1.0 && a >= 0.0,
        s"${r.getString(0)}: attainment must be a CDF: $a $b $c")
      assert(r.getAs[Double]("mean_latency_days") >= 0.0)
    }
  }
}
