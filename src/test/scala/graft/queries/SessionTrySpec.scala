package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Boundary-semantics handchecks for q193–q195: the exact-gap session
  * split (the one step where native session_window and q21's manual rule
  * differ), TRY-arithmetic NULL production, and percentile_disc element
  * selection on an even-sized group.
  */
class SessionTrySpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private val gapNs = 30L * 60L * 1000000000L

  private lazy val dir: String = {
    val d = tmpDir("sesstry")
    // user 1: two events EXACTLY one gap apart -> the closed horizon
    // MERGES them (boundary semantics); user 2: one µs beyond -> split
    Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, gapNs, 1L, "view", 1.0),
      (3L, 0L, 2L, "view", 1.0),
      (4L, gapNs + 1000L, 2L, "view", 1.0)) // 1 µs past the horizon
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq(
      (1L, 1L, 1, 50.0, 100.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 1L, 2, 10.0, 100.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 100L, 3, 20.0, 100.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 200L, 4, 40.0, 100.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q193 merges at exactly the gap and splits one step past it") {
    val r = run("q193_session_window", dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(r(1L).length == 1, "events exactly gap-apart must merge (closed horizon)")
    assert(r(1L)(0).getAs[Long]("span_us") == gapNs / 1000L)
    assert(r(2L).length == 2, "events past the gap must start a new session")
  }

  test("q195 nulls exactly the rows that would fault") {
    val r = run("q195_try_arithmetic", dir).collect()
    assert(r.length == 1)
    val x = r(0)
    assert(x.getAs[Long]("n") == 4L)
    assert(x.getAs[Long]("n_div_null") == 1L) // the qty=50 row
    // partkeys 100 and 200 are in the sampled slice (pmod 100 = 0) and
    // both overflow the 2^61 multiplier; the partkey-1 rows are unsampled
    assert(x.getAs[Long]("n_mul_overflow") == 2L)
    // successful divisions: qty 10 -> -1/40, qty 20 -> -1/30, qty 40 -> -1/10
    assert(x.getAs[Double]("max_inv_gap") == -0.025) // -1/40 is the max
  }

  test("q200 unions overlaps, merges touching intervals, splits gaps") {
    val d = tmpDir("cov")
    val m = 60L * 1000000000L // one minute in ns
    // user 1: events at 0 and 2 min (overlap: union = 7 min, one block);
    // user 2: events at 0 and EXACTLY 5 min (touching: union 10 min, ONE
    // block); user 3: events at 0 and 10 min (gap: 10 min, two blocks)
    Seq((1L, 0L, 1L), (2L, 2L * m, 1L),
      (3L, 0L, 2L), (4L, 5L * m, 2L),
      (5L, 0L, 3L), (6L, 10L * m, 3L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q200_interval_coverage")(spark, d).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("covered_us"), x.getAs[Long]("n_blocks"))).toMap
    val minUs = 60L * 1000000L
    assert(r(1L) == ((7L * minUs, 1L)))
    assert(r(2L) == ((10L * minUs, 1L)))
    assert(r(3L) == ((10L * minUs, 2L)))
  }

  test("q202 null-safe join keeps the NULL-bucket row that plain = drops") {
    import org.apache.spark.sql.functions._
    val r = run("q202_null_safe_join", "/root/testdata/sf0.001")
    val withNull = r.filter(col("bucket").isNull).collect()
    assert(withNull.length == 1, "the NULL bucket must match itself under <=>")
    assert(withNull(0).getAs[Long]("n_views") > 0 &&
      withNull(0).getAs[Long]("n_clicks") > 0)
    // the same join under plain equality loses exactly that row
    val v = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "view")
      .groupBy(nullif(pmod(round(col("value")).cast("long"), lit(10L)), lit(0L))
        .as("bucket")).count()
    val c = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click")
      .groupBy(nullif(pmod(round(col("value")).cast("long"), lit(10L)), lit(0L))
        .as("cb")).count()
    val plainEq = v.join(c, col("bucket") === col("cb")).count()
    assert(plainEq == r.count() - 1, "plain = must drop only the NULL row")
  }

  test("q194 percentile_disc picks an element, percentile_cont interpolates") {
    val r = run("q194_ordered_set_aggs", dir).collect()
    assert(r.length == 1)
    val x = r(0)
    // sorted qtys {10,20,40,50}: disc(0.5) -> first cumdist >= .5 -> 20;
    // cont(0.5) interpolates halfway between 20 and 40 -> 30
    assert(x.getAs[Double]("qty_med_disc") == 20.0)
    assert(x.getAs[Double]("qty_med_cont") == 30.0)
    assert(x.getAs[Double]("qty_p90_disc") == 50.0)
  }
}
