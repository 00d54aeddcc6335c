package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Handchecks for skewness/kurtosis (q139) and the Benford digit audit
  * (q140). */
class HigherMomentSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("moments")
    // Benford fixture: leading digits 1(x3: 1, 19, 123), 2, 3, 5(x2), 9
    Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 5.0), ("B", 5.0),
      ("A", 19.0), ("A", 123.0), ("B", 987.0))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q139: symmetric data has zero skew; constant data guards NULL") {
    val dir = tmpDir("m139")
    Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 5.0), ("B", 5.0))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q139_higher_moments")(spark, dir).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(got("A").getAs[Double]("mean") == 2.0)
    assert(got("A").getAs[Double]("skewness") == 0.0)
    assert(got("A").getAs[Double]("excess_kurtosis") == -1.5)
    assert(got("B").isNullAt(got("B").fieldIndex("skewness")))
    assert(got("B").isNullAt(got("B").fieldIndex("excess_kurtosis")))
  }

  test("q140: leading digits counted, Benford shares constant") {
    val got = SparkEntry.queries("q140_benford_digits")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("benford_share"))).toMap
    // values 1,2,3,5,5,19,123,987 -> digits 1:3 (1,19,123), 2:1, 3:1,
    // 5:2, 9:1
    assert(got(1) == (3L, 0.30103))
    assert(got(2) == (1L, 0.176091))
    assert(got(5) == (2L, 0.079181))
    assert(got(9) == (1L, 0.045757))
    assert(!got.contains(4) && !got.contains(6))
  }
}
