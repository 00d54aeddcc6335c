package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Handchecks for the evaluation-metric gates: known-value nDCG, the RBO
  * identical/reversed-ranking bounds, a textbook Kaplan-Meier cohort, and
  * bootstrap determinism. */
class EvalMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private val DAY = 86400000000000L

  private lazy val fixtures: String = {
    val dir = tmpDir("evalmetrics")
    // lang "a": both rankings identical (r1 = r2 = id); lang "b": exactly
    // reversed (r1 = 26-i, r2 = i); lang "c" carries the nDCG source
    val docs =
      (1 to 25).map(id => (id.toLong, "t", "a", "sa", 1000L - id)) ++
        (101 to 125).map(id => (id.toLong, "t", "b", "sb", id.toLong)) ++
        Seq( // source s1: observed ranking == ideal ranking -> nDCG 1
          (303L, "t", "c", "s1", 100L), // rel 3
          (307L, "t", "c", "s1", 99L),  // rel 3
          (302L, "t", "c", "s1", 98L),  // rel 2
          (301L, "t", "c", "s1", 97L),  // rel 1
          (304L, "t", "c", "s1", 96L))  // rel 0
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // KM cohort: deaths at t=1 (2 of 4) and t=3 (1 of 2), u3 censored
    Seq(
      (1L, 0L * DAY, 1L, "signup"), (1L, 1L * DAY, 2L, "purchase"),
      (2L, 0L * DAY, 3L, "click"), (2L, 1L * DAY, 4L, "purchase"),
      (3L, 0L * DAY, 5L, "click"), (3L, 3L * DAY, 6L, "click"),
      (4L, 0L * DAY, 7L, "signup"), (4L, 3L * DAY, 8L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (1 to 100).map(k => (k.toLong, (k % 37) * 3.5 + 10.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q234: observed ranking == ideal ranking scores nDCG exactly 1") {
    val r = SparkEntry.queries("q234_ndcg_mrr")(spark, fixtures)
      .filter($"source" === "s1").collect().head
    assert(r.getAs[Double]("ndcg10") == 1.0)
    assert(r.getAs[Int]("first_rel_pos") == 1)
    assert(r.getAs[Double]("mrr") == 1.0)
  }

  test("q235: identical rankings hit the depth-20 ceiling; reversed the floor") {
    val rows = SparkEntry.queries("q235_rank_biased_overlap")(spark, fixtures)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("rbo_e12"), r.getAs[Long]("n_head_common"))).toMap
    // ceiling: sum of the whole suffix-weight table (= sum d*W[d])
    assert(rows("a") == (878423345429L, 20L), rows("a").toString)
    // reversed 25-ranking: worse-rank m = max(i, 26-i) -> m=13 once,
    // m=14..20 twice each: SW(13) + 2*sum(SW(14..20))
    assert(rows("b") == (64655463508L, 15L), rows("b").toString)
  }

  test("q237: textbook KM cohort — S(1)=0.5, S(3)=0.25, censoring respected") {
    val got = SparkEntry.queries("q237_kaplan_meier")(spark, fixtures)
      .collect().map(r => (r.getAs[Long]("duration_days"),
        r.getAs[Long]("at_risk"), r.getAs[Long]("deaths"),
        r.getAs[Double]("survival"))).toSeq
    assert(got == Seq((1L, 4L, 2L, 0.5), (3L, 2L, 1L, 0.25)), got.toString)
  }

  test("q246: Poisson bootstrap is deterministic, ordered, near the exact CI") {
    def run() = SparkEntry.queries("q246_poisson_bootstrap")(spark, fixtures)
      .collect().head
    val (a, b) = (run(), run())
    assert(a == b, s"poisson bootstrap not deterministic: $a vs $b")
    val (lo, hi) = (a.getAs[Double]("lo4"), a.getAs[Double]("hi4"))
    assert(lo < hi, s"degenerate CI [$lo, $hi]")
    // same point estimate as the m-out-of-n gate (it's the plain mean)
    val exact = SparkEntry.queries("q238_bootstrap_ci")(spark, fixtures)
      .collect().head
    assert(a.getAs[Double]("point4") == exact.getAs[Double]("point4"))
    // both resampling schemes straddle the point estimate on this fixture
    assert(lo <= a.getAs[Double]("point4") && a.getAs[Double]("point4") <= hi)
  }

  test("q238: bootstrap draws are deterministic and the CI is ordered") {
    def run() = SparkEntry.queries("q238_bootstrap_ci")(spark, fixtures)
      .collect().head
    val (a, b) = (run(), run())
    assert(a == b, s"bootstrap not deterministic: $a vs $b")
    val (lo, hi, point) = (a.getAs[Double]("lo4"), a.getAs[Double]("hi4"),
      a.getAs[Double]("point4"))
    assert(lo < hi, s"degenerate CI [$lo, $hi]")
    assert(point >= 10.0 && point <= 136.0, s"point $point outside data range")
    assert(a.getAs[Long]("n_rows") == 100L)
  }
}
