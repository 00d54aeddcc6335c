package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Engine-internal replay for the q332 row-pattern gate: re-run the
  * run-encoding and the S C+ P match in plain Scala directly over the
  * ordered event list (no window algebra — a genuinely independent
  * formulation: literal left-to-right scan like a regex engine would),
  * and require the gate's matches and measures to agree exactly. The
  * scan-based replay doubles as proof of the scaladoc's claim that
  * run-space matching equals backtracking-free regex matching for this
  * pattern. */
class MatchRecognizeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("q332 matches replay from a literal left-to-right scan") {
    import spark.implicits._
    val out = SparkEntry.queries("q332_match_recognize")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("signup_ts_us"), r.getAs[Long]("n_clicks"),
          r.getAs[Long]("purchase_ts_us"), r.getAs[Long]("span_us"))))
      .toMap
    assert(out.nonEmpty)

    val ev = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3))
      // literal regex-engine scan for s c+ p over the raw row sequence:
      // earliest i with sym(i)=s, sym(i+1..j)=c (j>i), sym(j+1)=p
      val n = seq.length
      (0 until n).iterator.flatMap { i =>
        if (seq(i)._4 != "signup") None
        else {
          var j = i + 1
          while (j < n && seq(j)._4 == "click") j += 1
          if (j > i + 1 && j < n && seq(j)._4 == "purchase")
            Some(u -> ((seq(i)._2 / 1000L, (j - i - 1).toLong,
              seq(j)._2 / 1000L, (seq(j)._2 - seq(i)._2) / 1000L)))
          else None
        }
      }.take(1).map(identity)
    }
    assert(out == want.toMap, "row-pattern replay diverged")
    // the C+ quantifier must consume multi-click runs somewhere at this
    // scale, or the fixture only tests C (not C+)
    assert(out.values.exists(_._2 >= 2L), "no multi-click match exercised")
  }
}
