package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Handchecks for the SQL-text gates (q137 correlated EXISTS, q138
  * recursive CTE) plus a plan assertion that the EXISTS pair rewrites to
  * semi/anti joins rather than per-row subqueries. */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("sqlsurface")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (1L, 1L, 400000.0, "O"),
      (2L, 2L, 400000.0, "O"), (3L, 2L, 10.0, "F"),
      (4L, 3L, 10.0, "O"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("q137: big-ticket AND never-failed, by hand") {
    val got = SparkEntry.queries("q137_correlated_exists")(spark, fixtures)
      .collect().map(_.getAs[Long]("c_custkey")).toSeq
    // cust 1: qualifies; cust 2: has an F order; cust 3: no big ticket;
    // cust 4: no orders at all
    assert(got == Seq(1L))
  }

  test("q137 plan: EXISTS pair becomes semi + anti joins") {
    val plan = SparkEntry.queries("q137_correlated_exists")(spark, fixtures)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("LeftSemi"), s"expected a left-semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected a left-anti join:\n$plan")
  }

  test("q138: binary-tree levels from the recursive CTE") {
    val got = SparkEntry.queries("q138_recursive_cte")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Int]("depth") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))
      .toMap
    assert(got == Map(
      0 -> (1L, 0L, 0L), 1 -> (1L, 1L, 1L),
      2 -> (2L, 2L, 3L), 3 -> (3L, 4L, 6L)))
  }
}
