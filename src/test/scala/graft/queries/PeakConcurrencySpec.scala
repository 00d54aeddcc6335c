package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** q229 handcheck: overlap counting and the half-open touching rule. */
class PeakConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("q229: overlapping sessions stack, touching ones do not") {
    val dir = tmpDir("peak")
    def ev(id: Long, typ: String, t: String) =
      (id, Timestamp.valueOf(t), 1L, typ, 1.0, "{}")
    Seq(
      // 'view': three sessions opening within one 10-min span → peak 3
      ev(1, "view", "2024-01-01 10:00:00"),
      ev(2, "view", "2024-01-01 10:03:00"),
      ev(3, "view", "2024-01-01 10:06:00"),
      // 'click': back-to-back TOUCHING sessions (second starts exactly
      // when the first's [t, t+10min) interval ends) → peak 1
      ev(4, "click", "2024-01-01 10:00:00"),
      ev(5, "click", "2024-01-01 10:10:00"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q229_peak_concurrency")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("peak_concurrency")))
      .toMap
    assert(got("view") == (3L, 3L))
    assert(got("click") == (2L, 1L), "touching half-open intervals must not stack")
  }

  test("q230: half-life ranking by hand — recency beats raw size") {
    val dir = tmpDir("decay")
    def ev(id: Long, u: Long, t: String, v: Double) =
      (id, Timestamp.valueOf(t), u, "view", v, "{}")
    Seq(
      // user 1: 100.0 three days ago -> decayed 12.5
      ev(1, 1, "2024-01-01 10:00:00", 100.0),
      // user 2: 20.0 today -> decayed 20.0 (outranks the bigger stale one)
      ev(2, 2, "2024-01-04 10:00:00", 20.0),
      // user 3: 40 days ago -> decayed out entirely, but still ranked 0? no: filtered
      ev(3, 3, "2023-11-20 10:00:00", 999.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q230_decayed_leaderboard")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("rk") ->
        (r.getAs[Long]("user_id"), r.getAs[Double]("decayed_value")))
      .toMap
    assert(got(1L) == (2L, 20.0))
    assert(got(2L) == (1L, 12.5))
    assert(got.size == 2, "beyond-horizon activity must not appear at all")
  }
}
