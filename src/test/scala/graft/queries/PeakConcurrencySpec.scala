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
}
