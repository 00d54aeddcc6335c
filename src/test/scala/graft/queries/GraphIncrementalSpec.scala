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
