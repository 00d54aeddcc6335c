package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Semantic handchecks for the behavioral-analytics gates (q178–q183):
  * tiny fixtures with closed-form answers run through the REAL
  * `SparkEntry.queries` entries, plus a sequential-fold property proving
  * the q183 reflection identity against the recurrence it replaces.
  */
class BehaviorAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private val day = 86400000000000L // ns

  private lazy val fixtures: String = {
    val dir = tmpDir("behav")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, Double)]
    var id = 0L
    def ev(user: Long, ts: Long, tpe: String, v: Double): Unit = {
      id += 1; rows += ((id, ts, user, tpe, v))
    }
    // user 1 — capped balance: +5.00, -8.00 (clamps to 0), +3.00
    ev(1L, 1L, "purchase", 5.00)
    ev(1L, 2L, "click", 8.00)
    ev(1L, 3L, "purchase", 3.00)
    // user 2 — RSI: 15 strictly rising purchases -> all gains, RSI = 100
    (0 until 15).foreach(i => ev(2L, 100L + i, "purchase", 1.00 + i * 0.01))
    // user 3 — RSI: 15 flat purchases -> sg+sl = 0, RSI pinned to 50
    (0 until 15).foreach(i => ev(3L, 200L + i, "purchase", 2.00))
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // baskets: o1 {1,2,3}, o2 {1,2}, o3 {2,3}, o4 {1}
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** Hazard cohort alone (users elsewhere in the shared fixture would
    * join the risk set and shift every count). */
  private lazy val hazardFixtures: String = {
    val dir = tmpDir("hazard")
    Seq(
      (1L, 0L, 10L, "view", 1.0), (2L, 1L, 10L, "purchase", 1.0), // T = 0
      (3L, 10L, 11L, "view", 1.0), (4L, 10L + day, 11L, "purchase", 1.0), // T = 1
      (5L, 20L, 12L, "view", 1.0), // censored
      (6L, 30L, 13L, "view", 1.0), (7L, 30L + 3 * day, 13L, "error", 1.0)) // censored; sets horizon
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q183 clamps at zero and recovers after the clamp") {
    val r = run("q183_capped_balance", fixtures).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    // +500, -800 -> 0 (not -300), +300 -> 300
    assert(r(1L).getAs[Double]("final_balance") == 3.00)
    assert(r(1L).getAs[Double]("peak_balance") == 5.00)
    assert(r(1L).getAs[Long]("n_flows") == 3)
  }

  test("q183 reflection identity == sequential max(0, b+x) fold (gate corpus)") {
    import org.apache.spark.sql.functions._
    val got = run("q183_capped_balance", "/root/testdata/sf0.001").collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Double]("final_balance"), x.getAs[Double]("peak_balance"))).toMap
    // independent sequential reference: fold each user's flow list in order
    val flows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "purchase",
          round(col("value") * 100.0, 0).cast("long"))
          .otherwise(-round(col("value") * 100.0, 0).cast("long")).as("flow"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = flows.groupBy(_._1).map { case (u, fs) =>
      val bals = fs.sortBy(_._2).map(_._3)
        .scanLeft(0L)((b, x) => math.max(0L, b + x)).drop(1)
      u -> (bals.last / 100.0, bals.max / 100.0)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, (fin, peak)) =>
      assert(got(u) == ((fin, peak)), s"user $u")
    }
  }

  test("q178 RSI is 100 on monotone gains and 50 on a flat series") {
    val r = run("q178_rsi", fixtures).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Double]("rsi_14"))).toSeq
    // 15 rows/user, RSI defined from row 15 on -> exactly one row each
    assert(r == Seq((2L, 100.0), (3L, 50.0)))
  }

  test("q179 association metrics on a 4-basket handcheck") {
    val r = run("q179_market_basket", fixtures).collect()
      .map(x => (x.getAs[Long]("p1"), x.getAs[Long]("p2")) -> x).toMap
    val r12 = r((1L, 2L))
    assert(r12.getAs[Long]("pair_n") == 2)
    assert(r12.getAs[Double]("support") == 0.5) // 2 of 4 baskets
    assert(r12.getAs[Double]("confidence") == 0.666667) // 2 of 3 with p1
    assert(r12.getAs[Double]("lift") == 0.888889) // 2*4/(3*3)
    assert(r((1L, 3L)).getAs[Long]("pair_n") == 1)
    assert(r((2L, 3L)).getAs[Long]("pair_n") == 2)
  }

  test("q180 z-statistic recomputes from its own counts (gate corpus)") {
    val row = run("q180_ab_ztest", "/root/testdata/sf0.001").collect()(0)
    val (na, ka) = (row.getAs[Long]("n_a"), row.getAs[Long]("k_a"))
    val (nb, kb) = (row.getAs[Long]("n_b"), row.getAs[Long]("k_b"))
    assert(na > 0 && nb > 0 && ka <= na && kb <= nb)
    val p = (ka + kb).toDouble / (na + nb)
    val z = (ka.toDouble / na - kb.toDouble / nb) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(row.getAs[Double]("z") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getAs[Double]("rate_a") ==
      BigDecimal(ka.toDouble / na).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q182 Nelson-Aalen on a censored 4-user cohort, by hand") {
    val r = run("q182_cum_hazard", hazardFixtures).collect()
    // events at day 0 and 1; censored users drop out at day 3
    // day 0: n=4, d=1, H=0.25; day 1: n=3, d=1, H=0.25+1/3=0.583333
    assert(r.map(_.getAs[Long]("day")).toSeq == Seq(0L, 1L))
    val d0 = r(0); val d1 = r(1)
    assert(d0.getAs[Long]("n_risk") == 4 && d0.getAs[Long]("d_events") == 1)
    assert(d0.getAs[Double]("cum_hazard") == 0.25)
    assert(d1.getAs[Long]("n_risk") == 3 && d1.getAs[Long]("d_events") == 1)
    assert(d1.getAs[Double]("cum_hazard") == 0.583333)
  }

  test("q182 hazard is non-decreasing and at-risk non-increasing (gate corpus)") {
    val r = run("q182_cum_hazard", "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    val hz = r.map(_.getAs[Double]("cum_hazard")).toSeq
    assert(hz == hz.sorted, "cumulative hazard must be monotone")
    val risk = r.map(_.getAs[Long]("n_risk")).toSeq
    assert(risk == risk.sortBy(-_), "at-risk set can only shrink over time")
  }
}
