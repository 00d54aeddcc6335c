package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape assertions for the queries whose 100 TB story depends on a
  * specific physical form: the banded/bucketed paths must stay free of
  * driver-local data (a LocalTableScan in the plan means someone collected
  * a table and re-parallelized it — a single-machine bottleneck at scale).
  */
class ScaleShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q28 banded simhash NN plans as distributed joins, no driver-local data") {
    val plan = SparkEntry.queries("q28_simhash")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
    assert(plan.contains("Join"), "banded candidate join missing from plan")
  }

  test("q30 bucketed ANN plans as distributed joins, no driver-local data") {
    val plan = SparkEntry.queries("q30_ann_lsh_bucketed")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
  }

  test("q59 IVF ANN plans collect-free: hash joins only, no driver-local data") {
    val plan = SparkEntry.queries("q59_ann_ivf")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"assignment join fell back to a nested loop:\n$plan")
  }

  test("q03 plans without an Expand (distinct-count is structural, not Expand-based)") {
    val plan = SparkEntry.queries("q03_join_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"countDistinct Expand regressed:\n$plan")
  }

  test("shingle/band self-joins hold their shuffle-hash strategy") {
    // sort-merge on the long-string shingle stream measured 2.2x slower;
    // guard that the hint keeps winning through planner/AQE changes
    for (q <- Seq("q26_ngram_jaccard", "q27_minhash_lsh", "q28_simhash")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), s"$q lost its shuffle-hash join:\n$plan")
    }
  }

  test("q142 k-means assignment is map-only: no join, no driver-local data") {
    // round 6: the centroid model rides the driver (bounded k*dims) and
    // assignment is a typed map over the scan — the final plan must have
    // no join of ANY kind and no data-sized local relation
    val plan = SparkEntry.queries("q142_kmeans_assign")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"assignment should be map-only, found a join:\n$plan")
    assert(plan.contains("FileScan parquet"), s"lost the direct scan:\n$plan")
  }

  test("q146 prefix-join keeps its shuffle-hash strategy on all big joins") {
    val plan = SparkEntry.queries("q146_prefix_jaccard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"q146 lost its shuffle-hash joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"verification join fell back to SMJ:\n$plan")
  }

  test("q28 banded NN finds every planted near-duplicate (pigeonhole <= 3)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // any pair within hamming <= 3 shares one of the four 15-bit bands, so
    // the banded NN's reported distance for such documents must equal the
    // true minimum — verify against an in-test exhaustive check
    val out = SparkEntry.queries("q28_simhash")(spark, dir)
      .select($"doc_id", $"simhash", $"nn_doc", $"hamming").collect()
    val sigs = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (id, h) = (r.getLong(0), r.getLong(1))
      val exact = sigs.collect { case (oid, oh) if oid != id =>
        java.lang.Long.bitCount(h ^ oh)
      }.min
      if (exact <= 3) {
        assert(!r.isNullAt(3) && r.getInt(3) == exact,
          s"doc $id: banded NN ${if (r.isNullAt(3)) "none" else r.getInt(3)} " +
            s"missed exact distance $exact")
      }
    }
  }

  test("q151 semdedup plans collect-free with no nested-loop fallback") {
    val plan = SparkEntry.queries("q151_semdedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"within-cluster pair join fell back to a nested loop:\n$plan")
  }

  test("q154 joins every dimension arm by broadcast — facts are the only shuffle") {
    val plan = SparkEntry.queries("q154_local_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop fallback in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dimension arms lost broadcast:\n$plan")
    // region/nation/supplier/customer must never ride a shuffle exchange:
    // at most the fact-fact join + final agg/sort repartition
    val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 4, s"too many exchanges ($shuffles) for a dim-broadcast plan:\n$plan")
  }

  test("q160 linear-probe scoring is a pure projection over one scan") {
    val plan = SparkEntry.queries("q160_linear_probe")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe scoring should not join anything:\n$plan")
    assert(!plan.contains("LocalTableScan"), s"driver-local data in plan:\n$plan")
  }

  test("q166 regr family is one partial-aggregable pass: single pair of aggs, no join") {
    val plan = SparkEntry.queries("q166_regr_family")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"moment sketch needs no join:\n$plan")
    // one partial + one final HashAggregate pair over one scan
    assert("HashAggregate".r.findAllIn(plan).size == 2,
      s"expected exactly partial+final aggregate:\n$plan")
  }

  test("q172 window-distinct rewrite shares one exchange across both window passes") {
    val plan = SparkEntry.queries("q172_window_distinct")(spark, dir)
      .queryExecution.executedPlan.toString
    // one hash exchange feeds both Window nodes; the only other exchange
    // is the final ORDER BY range repartition
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"dense_rank rewrite must reuse one partitioning, got $hashEx:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2, s"expected two window passes:\n$plan")
  }

  test("q173 multi-distinct plans through Expand, not self-joins") {
    val plan = SparkEntry.queries("q173_multi_distinct")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct should Expand:\n$plan")
    assert(!plan.contains("Join"), s"multi-distinct must not self-join:\n$plan")
  }

  test("q174 null-ordered top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q174_null_ordering")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT over ORDER BY should be a bounded top-k, not a full sort:\n$plan")
  }

  test("q186 Q21 shape scans lineitem once — the aggregate form, not double EXISTS") {
    val plan = SparkEntry.queries("q186_only_late_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    val liScans = "FileScan parquet.*lineitem".r.findAllIn(plan).size
    assert(liScans == 1, s"one-pass fault aggregate must scan the fact once, got $liScans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop fallback in plan:\n$plan")
  }

  test("q188 attribution is pure windows — no join against touch history") {
    val plan = SparkEntry.queries("q188_attribution")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"LOCF attribution must not join:\n$plan")
    assert(plan.contains("Window"), s"expected the LOCF window pass:\n$plan")
  }

  test("q189 CUSUM scans events once; windows run on the post-aggregate cells") {
    val plan = SparkEntry.queries("q189_cusum_alarm")(spark, dir)
      .queryExecution.executedPlan.toString
    val evScans = "FileScan parquet.*events".r.findAllIn(plan).size
    assert(evScans == 1, s"daily cells need one scan, got $evScans:\n$plan")
    assert(!plan.contains("Join"), s"CUSUM needs no join:\n$plan")
  }

  test("q190 semi-additive roll-up is two grouped passes, no window, no join") {
    val plan = SparkEntry.queries("q190_eod_balance")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"arg-max form must not sort a window:\n$plan")
    assert(!plan.contains("Join"), s"semi-additive roll-up must not join:\n$plan")
  }

  test("q198 Q8 shape broadcasts every dimension arm — facts are the only shuffles") {
    val plan = SparkEntry.queries("q198_market_share")(spark, dir)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 4, s"expected part/customer/supplier/nation arms to broadcast, got $bhj:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop fallback in plan:\n$plan")
  }

  test("q242 triple-join legs share one pruned-items exchange (round-14 shape)") {
    // the rewrite from nested CodegenFallback transforms to a 3-way
    // equi-join is only shuffle-neutral because the three identical
    // pruned-item legs dedupe via exchange reuse — pin that, and pin
    // that the expansion stayed lambda-free (no ArrayTransform)
    val df = SparkEntry.queries("q242_apriori_triples")(spark, dir)
    df.collect() // AQE: reuse is only visible in the final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"the three pruned-item legs must share an exchange:\n$plan")
    assert(!plan.contains("transform("),
      s"interpreted array lambda back in the triple expansion:\n$plan")
  }

  test("q338 span counts plan without an Expand (two-phase, round-14 shape)") {
    // count + countDistinct in one aggregate plans an Expand that
    // doubles the heaviest span-string exchange — the two-phase
    // (span, doc_id) pre-aggregation must keep it out of the plan
    val plan = SparkEntry.queries("q338_maximal_spans")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"countDistinct Expand regressed:\n$plan")
  }

  test("q192 bridge scans lineitem once and broadcasts the part dimension") {
    val plan = SparkEntry.queries("q192_price_volume_bridge")(spark, dir)
      .queryExecution.executedPlan.toString
    val liScans = "FileScan parquet.*lineitem".r.findAllIn(plan).size
    assert(liScans == 1, s"conditional-sum cells need one scan, got $liScans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"part dimension should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge expected at dimension size:\n$plan")
  }
}
