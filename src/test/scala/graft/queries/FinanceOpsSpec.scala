package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic handchecks for the finance/monitoring batch (q189–q192):
  * CUSUM alarms on an injected drift, day-end semi-additive balances,
  * TWAP on a hand-computed holding schedule, and the price–volume
  * bridge's accounting identity on the gate corpus.
  */
class FinanceOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private val gate = "/root/testdata/sf0.001"
  private val day = 86400000000000L

  private lazy val fixtures: String = {
    val dir = tmpDir("finops")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, Double)]
    var id = 0L
    def ev(user: Long, ts: Long, tpe: String, v: Double): Unit = {
      id += 1; rows += ((id, ts, user, tpe, v))
    }
    // drifted series: 10 days at 1.00/day then 10 days at 3.00/day —
    // mean 2.00, so the scaled CUSUM climbs through the second half
    (0 until 20).foreach(i =>
      ev(1L, i * day + 1L, "click", if (i < 10) 1.00 else 3.00))
    // flat series: no drift, CUSUM pinned at 0, no alarm possible
    (0 until 20).foreach(i => ev(2L, i * day + 2L, "error", 2.00))
    // TWAP user 3: 1.00 held 10 s, 2.00 held 20 s, final obs excluded
    ev(3L, 0L, "purchase", 1.00)
    ev(3L, 10L * 1000000000L, "purchase", 2.00)
    ev(3L, 30L * 1000000000L, "purchase", 9.99)
    // day-end user 4: two events on day 0 (last wins), one on day 1
    ev(4L, 5L, "view", 7.00)
    ev(4L, 6L, "view", 4.00)
    ev(4L, day + 7L, "view", 9.00)
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q189 alarms on the drifted series and stays quiet on the flat one") {
    val r = run("q189_cusum_alarm", fixtures).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    val drift = r("click")
    // days 0-9: v = 20*100 - 4000 = -2000/day, running min falls;
    // days 10-19: v = +2000/day, cusum rises 2000/day from day 10 on;
    // alarm when 2*cusum > t = 4000 cents -> cusum > 2000 -> day 11
    assert(drift.getAs[Long]("n_alarm_days") == 9L)
    assert(drift.getAs[Long]("first_alarm_day") == 11L)
    val flat = r("error")
    assert(flat.getAs[Long]("n_alarm_days") == 0L)
    assert(flat.isNullAt(flat.fieldIndex("first_alarm_day")))
    assert(flat.getAs[Double]("peak_ratio") == 0.0)
  }

  test("q189 reflection identity equals the sequential CUSUM fold (gate corpus)") {
    val got = run("q189_cusum_alarm", gate).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_alarm_days"), x.getAs[Double]("peak_ratio"))).toMap
    // independent sequential reference
    val cells = graft.Tables.events(spark, gate)
      .groupBy($"event_type", expr("ts div 86400000000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cells.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val t = xs.sum
      var s = 0L
      val cusums = xs.map { x => s = math.max(0L, s + (n * x - t)); s }
      tpe -> (cusums.count(c => 2 * c > t).toLong,
        BigDecimal(cusums.max.toDouble / t)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expected)
  }

  test("q190 takes the last value per user-day and sums across users") {
    val r = run("q190_eod_balance", fixtures).collect()
      .map(x => x.getAs[Long]("day") ->
        (x.getAs[Long]("n_active_users"), x.getAs[Double]("eod_total"))).toMap
    // day 0: u1 1.00, u2 2.00, u3 9.99 (last purchase), u4 4.00 (6 > 5)
    assert(r(0L) == ((4L, 16.99))) // 1.00 + 2.00 + 9.99 + 4.00
    // day 1: u1 1.00, u2 2.00, u4 9.00
    assert(r(1L) == ((3L, 12.00)))
  }

  test("q191 weights prices by holding time and drops the open tail") {
    val r = run("q191_twap", fixtures).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_intervals"), x.getAs[Double]("twap"))).toMap
    // (100c*10s + 200c*20s) / 30s / 100 = 1.666667; the 9.99 obs has no
    // forward interval and never enters the average
    assert(r(3L) == ((2L, 1.666667)))
    assert(!r.contains(1L) || r(1L)._1 > 0) // clicks filtered out anyway
  }

  test("q192 bridge identity: delta = price + volume + cross + new - lost (gate corpus)") {
    val rows = run("q192_price_volume_bridge", gate).collect()
    assert(rows.length == 25)
    rows.foreach { x =>
      val lhs = x.getAs[Double]("delta_rev")
      val rhs = x.getAs[Double]("price_effect") + x.getAs[Double]("volume_effect") +
        x.getAs[Double]("cross_effect") + x.getAs[Double]("new_rev") -
        x.getAs[Double]("lost_rev")
      assert(math.abs(lhs - rhs) < 0.05,
        s"${x.getAs[String]("p_brand")}: $lhs vs $rhs")
    }
  }
}
