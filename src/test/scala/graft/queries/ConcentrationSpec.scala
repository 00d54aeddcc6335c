package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Closed-form handchecks for the concentration gates (q130-q132). */
class ConcentrationSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000000L

  private lazy val fixtures: String = {
    val dir = tmpDir("conc")
    Seq((1, "R1"), (2, "R2")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "N1", 1), (2, "N2", 1), (3, "N3", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1, "SEGA"), (2L, 2, "SEGA"), (3L, 3, "SEGB"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // orders double as the q132 Gini fixture: SEGA gets {1.00, 1.00, 2.00}
    // (G = 1/6), SEGB gets {5.00, 5.00} (identical values -> G = 0)
    Seq((1L, 1L, 1.00), (2L, 1L, 1.00), (3L, 2L, 2.00),
      (4L, 3L, 5.00), (5L, 3L, 5.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // revenue: N1 = 10, N2 = 40*(1-.25) = 30, N3 = 20
    Seq((1L, 10.0, 0.0), (3L, 40.0, 0.25), (4L, 20.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // trigram fixture: u1 path a,b,a,b,b; u2 too short; u3 single event
    Seq(
      (1L, 1000L, 1L, "a", 0.0), (2L, 2000L, 1L, "b", 0.0),
      (3L, 3000L, 1L, "a", 0.0), (4L, 4000L, 1L, "b", 0.0),
      (5L, 5000L, 1L, "b", 0.0),
      (6L, day, 2L, "a", 0.0), (7L, day + 1, 2L, "b", 0.0),
      (8L, 2 * day, 3L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q130 shares of region and total, by hand") {
    // orders 1,2 belong to cust 1 (N1): revenue N1 = 10 (order 1 only has
    // a lineitem); order 3 -> cust 2 (N2) = 30; order 4 -> cust 3 (N3) = 20
    val got = SparkEntry.queries("q130_share_of_parent")(spark, fixtures)
      .collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[String]("r_name"), r.getAs[Double]("revenue"),
          r.getAs[Double]("share_of_region"), r.getAs[Double]("share_of_total")))
      .toMap
    assert(got("N1") == ("R1", 10.0, 0.25, 0.166667))
    assert(got("N2") == ("R1", 30.0, 0.75, 0.5))
    assert(got("N3") == ("R2", 20.0, 1.0, 0.333333))
  }

  test("q131 trigram paths and shares") {
    val got = SparkEntry.queries("q131_event_trigrams")(spark, fixtures)
      .collect()
      .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3")) ->
        (r.getAs[Long]("n_paths"), r.getAs[Double]("share"))).toMap
    // u1's a,b,a,b,b yields (a,b,a), (b,a,b), (a,b,b); nothing else
    assert(got.size == 3)
    assert(got(("a", "b", "a")) == (1L, 0.333333))
    assert(got(("b", "a", "b")) == (1L, 0.333333))
    assert(got(("a", "b", "b")) == (1L, 0.333333))
  }

  test("q132 Gini: hand value and the equal-values-zero law") {
    val got = SparkEntry.queries("q132_gini")(spark, fixtures).collect()
      .map(r => r.getAs[String]("seg") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value"),
          r.getAs[Double]("gini"))).toMap
    // SEGA {1,1,2}: G = 2*(1*1+2*1+3*2)/(3*4) - 4/3 = 1/6
    assert(got("SEGA") == (3L, 4.0, 0.166667))
    assert(got("SEGB") == (2L, 10.0, 0.0))
  }
}
