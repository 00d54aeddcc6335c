package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** Semantics handchecks for q216 (point-in-time feature join): the
  * union-LOCF kernel must reproduce correlated as-of probe semantics —
  * NULL before the first version, version switch at the right instant,
  * same-timestamp ties broken by event_id — with NO join in the plan. */
class PitFeatureJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val fixtures: String = {
    val dir = tmpDir("pitjoin")
    Seq(
      // user 1: purchase BEFORE any signup → NULL feature
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase", 10.0, """{"k": 99}"""),
      (2L, ts("2024-01-02 00:00:00"), 1L, "signup", 0.0, """{"k": 7}"""),
      (3L, ts("2024-01-03 00:00:00"), 1L, "purchase", 20.0, """{"k": 99}"""),
      (4L, ts("2024-01-04 00:00:00"), 1L, "signup", 0.0, """{"k": 8}"""),
      (5L, ts("2024-01-05 00:00:00"), 1L, "purchase", 30.0, """{"k": 99}"""),
      // user 2: signup and purchase at the SAME timestamp — the signup's
      // lower event_id sorts first, so the purchase sees k=5, version 1
      (6L, ts("2024-02-01 00:00:00"), 2L, "signup", 0.0, """{"k": 5}"""),
      (7L, ts("2024-02-01 00:00:00"), 2L, "purchase", 40.0, """{"k": 99}"""),
      // user 2: purchase at same ts as a LATER signup but with a SMALLER
      // event_id: sorts before the signup, must still see k=5/version 1
      (8L, ts("2024-02-02 00:00:00"), 2L, "purchase", 50.0, """{"k": 99}"""),
      (9L, ts("2024-02-02 00:00:00"), 2L, "signup", 0.0, """{"k": 6}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q216: NULL before v1, version switches at signup, ties by event_id") {
    val got = SparkEntry.queries("q216_pit_feature_join")(spark, fixtures)
      .collect()
      .map { r =>
        r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Long]("plan_k")).map(_.toLong),
            Option(r.getAs[java.lang.Long]("plan_version")).map(_.toLong))
      }.toMap
    assert(got(1L) == (None, None))            // pre-signup fact
    assert(got(3L) == (Some(7L), Some(1L)))    // between v1 and v2
    assert(got(5L) == (Some(8L), Some(2L)))    // after v2
    assert(got(7L) == (Some(5L), Some(1L)))    // tie: signup id 6 < purchase id 7
    assert(got(8L) == (Some(5L), Some(1L)))    // tie: purchase id 8 < signup id 9
  }

  test("q216 plan: union-LOCF kernel — one window, zero joins") {
    val p = SparkEntry.queries("q216_pit_feature_join")(spark, fixtures)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"PIT kernel must not join:\n$p")
    assert(p.contains("Window"), s"expected the LOCF window pass:\n$p")
  }
}
