package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Closed-form handchecks for the normalization gates (q134-q136). */
class NormalizationSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("norm")
    // grp 1: prices 1.00(w1) 2.00(w2) 3.00(w1) -> crossing at 2.00
    // grp 2: prices 1.00(w1) 2.00(w1) -> even split takes the LOWER value
    Seq(
      (1L, 1.00, 1.0), (1L, 2.00, 2.0), (1L, 3.00, 1.0),
      (2L, 1.00, 1.0), (2L, 2.00, 1.0))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1, "R1"), (2, "R2")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "N1", 1), (2, "N2", 1), (3, "N3", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // balances 10, 20, 20, 30 for the quantile map
    Seq((1L, 1, 10.0), (2L, 2, 20.0), (3L, 3, 20.0), (4L, 1, 30.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // R1 revenue: N1 75 (cust 1: 40+35), N2 25 -> HHI .75^2+.25^2 = .625
    // R2: N3 alone -> HHI 1.0
    Seq((1L, 1L, 40.0), (2L, 1L, 35.0), (3L, 2L, 25.0), (4L, 3L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q134 weighted median: crossing rule and even-split lower value") {
    val got = SparkEntry.queries("q134_weighted_median")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("grp") ->
        (r.getAs[Double]("weighted_median_price"), r.getAs[Long]("total_qty")))
      .toMap
    assert(got(1L) == (2.0, 4L))
    assert(got(2L) == (1.0, 2L))
  }

  test("q135 HHI: duopoly .625, monopoly 1.0") {
    val got = SparkEntry.queries("q135_hhi_concentration")(spark, fixtures)
      .collect()
      .map(r => r.getAs[String]("r_name") ->
        (r.getAs[Long]("n_nations"), r.getAs[Double]("hhi"))).toMap
    assert(got("R1") == (2L, 0.625))
    assert(got("R2") == (1L, 1.0))
  }

  test("q136 quantile normalization: mid-ranks over ties") {
    // cust 1 for q136 reads only c_custkey/c_acctbal; nation keys unused
    val got = SparkEntry.queries("q136_quantile_normalize")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Double]("q_norm")).toMap
    assert(got == Map(1L -> 0.25, 2L -> 0.625, 3L -> 0.625, 4L -> 1.0))
  }
}
