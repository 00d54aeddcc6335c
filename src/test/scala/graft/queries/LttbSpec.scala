package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** Handcheck for q222 (largest-triangle downsampling): the spike must
  * survive decimation where first/avg-per-bucket would erase it, and
  * series endpoints are kept by convention. */
class LttbSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("lttb")
    def ev(id: Long, t: String, v: Double) =
      (id, Timestamp.valueOf(t), 1L, "view", v, "{}")
    Seq(
      // day 1: the series START (kept by the endpoint convention)
      ev(1, "2024-01-01 01:00:00", 10.0),
      ev(2, "2024-01-01 05:00:00", 10.0),
      ev(3, "2024-01-01 09:00:00", 10.0),
      // day 2: flat except a SPIKE at 13:00 — the apex's neighbor span
      // (03:00..19:00) is the widest high-deviation triangle of the day
      ev(4, "2024-01-02 01:00:00", 10.0),
      ev(5, "2024-01-02 03:00:00", 10.0),
      ev(6, "2024-01-02 13:00:00", 99.0),
      ev(7, "2024-01-02 19:00:00", 10.0),
      ev(10, "2024-01-02 21:00:00", 10.0),
      // day 3: monotone drift, last point is the series END
      ev(8, "2024-01-03 01:00:00", 11.0),
      ev(9, "2024-01-03 09:00:00", 12.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q222: the spike wins its bucket; endpoints win theirs") {
    val got = SparkEntry.queries("q222_lttb_downsample")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("event_id"))
      .toMap
    assert(got.size == 3, s"one survivor per day bucket: $got")
    val byDay = got.toSeq.sortBy(_._1).map(_._2)
    assert(byDay(0) == 1L, s"day 1 must keep the series start, got $got")
    assert(byDay(1) == 6L, s"day 2 must keep the 99.0 spike, got $got")
    assert(byDay(2) == 9L, s"day 3 must keep the series end, got $got")
  }
}
