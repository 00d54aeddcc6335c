package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Negative path for q66's within-bound claims: the oracle asserts the
  * claims are TRUE (one-sided — a violation hash-fails the gate), so it
  * can never catch a bug that accidentally hardcodes them true. This spec
  * closes that hole by perturbing the sketch: with a deliberately coarse
  * accuracy the Greenwald-Khanna rank guarantee (error <= 1/accuracy) is
  * far wider than the +/-0.005 rank band, and the claim must flip FALSE
  * on a distribution whose values separate ranks. */
class ApproxClaimSpec extends SparkTestBase {

  test("coarse sketch flips the within-bound claim false; fine sketch holds") {
    import spark.implicits._
    // 100k distinct uniform values in one group: every rank maps to a
    // distinct value, so rank displacement IS value displacement and the
    // +/-0.005 band spans exactly 1000 values around each target.
    val df = spark.range(1, 100001).select(lit("g").as("grp"),
      $"id".cast("double").as("x")).coalesce(1)

    // accuracy=2 -> rank error up to 0.5: the sketch keeps a handful of
    // quantile summaries and cannot place p50/p99 within 0.005
    val coarse = StatsQueries.quantileClaims(df, "grp", "x", accuracy = 2)
      .collect().head
    assert(!coarse.getAs[Boolean]("p50_within_bound") ||
      !coarse.getAs[Boolean]("p99_within_bound"),
      "coarse sketch unexpectedly landed inside the rank band — claim " +
        "columns may not depend on the sketch")

    // the gated accuracy honors the band on the same data
    val fine = StatsQueries.quantileClaims(df, "grp", "x", accuracy = 10000)
      .collect().head
    assert(fine.getAs[Boolean]("p50_within_bound") &&
      fine.getAs[Boolean]("p99_within_bound"))
  }
}
