package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** Handchecks + plan shapes for the ANSI frame-semantics rewrites:
  * q209 (EXCLUDE CURRENT ROW via inclusive-frame subtraction) and
  * q210 (GROUPS mode via dense_rank + RANGE on the dense index). */
class FrameSemanticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val fixtures: String = {
    val dir = tmpDir("framesem")
    // supplier 1: three rows, one day apart; supplier 2: a calendar GAP
    // (Jan 1 → Jan 5/6) plus a same-day tie on Jan 5
    Seq(
      (101L, 1L, 1, 10.00, 1.0, ts("2020-01-01 00:00:00")),
      (102L, 1L, 1, 20.00, 2.0, ts("2020-01-02 00:00:00")),
      (103L, 1L, 1, 30.00, 3.0, ts("2020-01-03 00:00:00")),
      (201L, 2L, 1, 5.00, 10.0, ts("2020-01-01 00:00:00")),
      (202L, 2L, 1, 6.00, 20.0, ts("2020-01-05 00:00:00")),
      (203L, 2L, 1, 7.00, 30.0, ts("2020-01-05 00:00:00")),
      (204L, 2L, 1, 8.00, 40.0, ts("2020-01-06 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_linenumber",
        "l_extendedprice", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(
      (1L, "a b a b c"),          // top bigram "a b" ×2 of 4 slots
      (2L, "x y z x"),            // all bigrams tie → lexicographic min
      (3L, "spark q join w window spark"), // gaps: |0-2|=2, |5-2|=3
      (4L, "spark join only"))    // no "window" → excluded from q212
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q209: leave-one-out peer stats by hand") {
    val got = SparkEntry.queries("q209_window_exclude")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        (r.getAs[Long]("peer_cnt"), r.getAs[Double]("peer_avg")))
      .toMap
    // supplier 1 (10, 20, 30): every frame spans all three rows
    assert(got(101L) == (2L, 25.0)) // (20+30)/2
    assert(got(102L) == (2L, 20.0)) // (10+30)/2
    assert(got(103L) == (2L, 15.0)) // (10+20)/2
  }

  test("q210: GROUPS frame bridges calendar gaps and keeps day ties whole") {
    val got = SparkEntry.queries("q210_groups_frame")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        (r.getAs[Double]("qty_3day_groups"), r.getAs[Long]("rows_3day_groups")))
      .toMap
    // supplier 2 day groups: {Jan1:[10]}, {Jan5:[20,30]}, {Jan6:[40]}.
    // Jan5's frame = all three GROUPS (Jan1 is the previous group despite
    // the 4-day gap — RANGE semantics would drop it); both Jan5 rows see
    // the identical group stats.
    assert(got(202L) == (100.0, 4L))
    assert(got(203L) == (100.0, 4L))
    assert(got(201L) == (60.0, 3L))  // Jan1: itself + Jan5 group
    assert(got(204L) == (90.0, 3L))  // Jan6: Jan5 group + itself
  }

  test("q220: EXCLUDE GROUP drops same-day rows, EXCLUDE TIES keeps self") {
    val got = SparkEntry.queries("q220_exclude_group_ties")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        (r.getAs[Double]("qty_excl_group"), r.getAs[Double]("qty_excl_ties"),
          r.getAs[Long]("n_excl_group")))
      .toMap
    // supplier 2: Jan1 is >2 days from everything → empty exclusion frame
    assert(got(201L) == (0.0, 10.0, 0L))
    // Jan5 tie pair: group-excluded drops BOTH 20 and 30; ties-excluded
    // keeps the current row only
    assert(got(202L) == (40.0, 60.0, 1L))
    assert(got(203L) == (40.0, 70.0, 1L))
    assert(got(204L) == (50.0, 90.0, 2L))
    // supplier 1 (1,2,3 on consecutive days, no ties): group == ties − self
    assert(got(101L) == (5.0, 6.0, 2L))
    assert(got(102L) == (4.0, 6.0, 2L))
    assert(got(103L) == (3.0, 6.0, 2L))
  }

  test("q209/q210/q220 plans: one exchange per window family (rewrite adds none)") {
    for (q <- Seq("q209_window_exclude", "q210_groups_frame",
        "q220_exclude_group_ties")) {
      val plan = SparkEntry.queries(q)(spark, fixtures)
        .queryExecution.executedPlan.toString()
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n == 1, s"$q expected exactly 1 hash exchange, got $n:\n$plan")
    }
  }

  test("q211: top-bigram mass and lexicographic tie-break by hand") {
    val got = SparkEntry.queries("q211_top_ngram_mass")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("top_bigram"), r.getAs[Long]("top_cnt"),
          r.getAs[Double]("top_share")))
      .toMap
    assert(got(1L) == ("a b", 2L, 0.5))
    assert(got(2L) == ("x y", 1L, 0.333333)) // tie → lexicographically first
  }

  test("q212: conjunction filters and min-gap by hand") {
    val rows = SparkEntry.queries("q212_proximity_search")(spark, fixtures)
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L)) // doc 4 lacks 'window'
    val r = rows.head
    assert(r.getAs[Long]("tf_spark") == 2L)
    assert(r.getAs[Long]("tf_join") == 1L)
    assert(r.getAs[Long]("tf_window") == 1L)
    assert(r.getAs[Long]("min_gap") == 2L)
  }
}
