package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Handchecks for the profiling/cleaning gates: q166 regression
  * aggregates on an exactly-linear relation, q167 width_bucket's under /
  * overflow buckets, q168 TRY_CAST accept/reject accounting, q169
  * digit-mask shape. */
class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("profiling")
    // exactly linear: price = 100*qty + 7 -> slope 100, intercept 7, r2 1
    Seq(("A", 1.0, 107.0), ("A", 2.0, 207.0), ("A", 3.0, 307.0),
        ("B", 10.0, 1007.0), ("B", 20.0, 2007.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // one under-range, one overflow, two mid-range values
    Seq(1000.0, 60000.0, 70001.0, 460000.0)
      .toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((97L, "Customer#000000097", 1L), (194L, "Customer#000000194", 1L),
        (195L, "nodigits", 2L))
      .toDF("c_custkey", "c_name", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("q166: exact fit on an exactly-linear relation") {
    val rows = SparkEntry.queries("q166_regr_family")(spark, fixtures)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2")))
      .toMap
    assert(rows("A") == ((100.0, 7.0, 1.0)))
    assert(rows("B") == ((100.0, 7.0, 1.0)))
  }

  test("q167: under-range lands in bucket 0, overflow in bucket n+1") {
    val got = SparkEntry.queries("q167_width_bucket")(spark, fixtures)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_orders"))
      .toMap
    // 1000 < 50000.005 -> 0; 60000 -> bucket 1 [50000.005, 70000.005);
    // 70001 -> bucket 2; 460000 >= 450000.005 -> 21
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 21L -> 1L))
  }

  test("q168: even keys parse, names reject, sums exact") {
    val got = SparkEntry.queries("q168_try_cast")(spark, fixtures)
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_parsed"),
         r.getAs[Long]("n_rejected"), r.getAs[Long]("parsed_sum")))
      .toMap
    // nation 1: key 97 odd -> name rejected; key 194 even -> parses to 194
    assert(got(1L) == ((2L, 1L, 1L, 194L)))
    // nation 2: key 195 odd -> "nodigits" rejected; sum over no rows is NULL-as-absent
    assert(got(2L)._1 == 1L && got(2L)._3 == 1L)
  }

  test("q169: digits mask to '#', count matches, slice keeps only 1-in-97 keys") {
    val rows = SparkEntry.queries("q169_pii_mask")(spark, fixtures).collect()
    val byKey = rows.map(r => r.getAs[Long]("c_custkey") ->
      (r.getAs[String]("name_masked"), r.getAs[Long]("n_masked"))).toMap
    assert(byKey.keySet == Set(97L, 194L)) // 195 is not divisible by 97
    assert(byKey(97L) == (("Customer##########", 9L)))
    assert(byKey(194L) == (("Customer##########", 9L)))
  }
}
