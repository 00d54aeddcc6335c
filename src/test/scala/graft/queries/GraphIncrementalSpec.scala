package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Shape and semantics checks for q82–q84: incremental-merge equivalence,
  * triangle canonicalization, and the outlier scorer's broadcast shape. */
class GraphIncrementalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q82 split filters push down to the parquet scan") {
    // both branches must prune at the scan: an incremental maintenance
    // pass that reads all of history back defeats its own purpose
    val p = SparkEntry.queries("q82_incremental_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), LessThan(ts")
        || p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"ts split filter not pushed to scan:\n$p")
  }

  test("q83 triangles come out in strict canonical vertex order") {
    val rows = SparkEntry.queries("q83_triangle_count")(spark, dir).collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && b < c, s"non-canonical triangle ($a,$b,$c)")
    }
  }

  test("q84 moment table broadcasts; no window over the event stream") {
    val p = SparkEntry.queries("q84_outlier_zscore")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"moment join not broadcast:\n$p")
    assert(!p.contains("Window"), s"unexpected window sort:\n$p")
  }

  test("q214 delta terms broadcast the batch side; base term does not") {
    val p = SparkEntry.queries("q214_delta_join_view")(spark, dir)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected the three delta terms as broadcast joins:\n$p")
  }

  test("q214 expansion == full recompute on a hand-built base/delta split") {
    import spark.implicits._
    val dir2 = tmpDir("deltajoin")
    // custkey 20/40 are delta customers; orderkey 10/20/30 are delta orders
    Seq((1L, 100L), (20L, 200L), (21L, 100L), (40L, 200L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir2/customer.parquet")
    Seq(
      (10L, 1L, 5.0),   // ΔO ⋈ C
      (11L, 1L, 7.0),   // O ⋈ C (base view)
      (20L, 20L, 11.0), // ΔO ⋈ ΔC
      (21L, 20L, 13.0), // O ⋈ ΔC
      (30L, 99L, 17.0)) // ΔO with no matching customer: drops out
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val got = SparkEntry.queries("q214_delta_join_view")(spark, dir2)
      .collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("revenue")))
      .toMap
    assert(got == Map(100L -> (2L, 12.0), 200L -> (2L, 24.0)))
  }

  test("q84 z-scores are scale-free: outlier counts stay sane") {
    val rows = SparkEntry.queries("q84_outlier_zscore")(spark, dir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val outliers = r.getAs[Long]("n_outliers")
      // Chebyshev: at most n/9 rows can sit beyond 3 sigma
      assert(outliers <= n / 9 + 1,
        s"${r.getString(0)}: $outliers outliers of $n violates Chebyshev")
    }
  }
}
