package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** q255 greedy max-coverage invariants on the real sf0.001 corpus (the
  * exact pick-by-pick values are hash-gated against the DuckDB replay;
  * this spec pins the submodular structure any correct greedy must have). */
class GreedyCoverageSpec extends SparkTestBase {

  private lazy val rows =
    SparkEntry.queries("q255_greedy_coverage")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("marginal gains are monotonically non-increasing (submodularity)") {
    val gains = rows.map(_._3)
    assert(gains.nonEmpty)
    gains.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"greedy gain increased: $a -> $b")
    }
  }

  test("covered_cum is exactly the running sum of gains") {
    var cum = 0L
    rows.foreach { case (rank, _, gain, covered) =>
      cum += gain
      assert(covered === cum,
        s"pick $rank: covered $covered != running gain sum $cum " +
          "(every pick's gain must be NEW shingles only)")
    }
  }

  test("no document is picked twice") {
    val docs = rows.map(_._2)
    assert(docs.distinct.length === docs.length)
  }
}
