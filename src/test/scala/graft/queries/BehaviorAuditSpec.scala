package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Closed-form handchecks for the MAD outlier, Markov transition, rolling
  * active-user, and FK-audit gates (q126-q129), via the real
  * `SparkEntry.queries` entries on parquet fixtures. */
class BehaviorAuditSpec extends SparkTestBase {
  import spark.implicits._

  private val day = 86400000000000L // ns

  private lazy val fixtures: String = {
    val dir = tmpDir("behavior")
    Seq(
      (1L, 1000L, 1L, "a", 1.0),
      (2L, 2000L, 1L, "b", 2.0),
      (3L, 3000L, 1L, "a", 3.0),
      (7L, 4000L, 1L, "b", 3.0),
      (8L, 5000L, 1L, "b", 4.0),
      (4L, 7 * day, 2L, "a", 4.0),
      (5L, 7 * day + 1000L, 2L, "b", 100.0),
      (6L, 5 * day, 3L, "a", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq(Tuple1(1)).toDF("n_nationkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1), (2L, 99)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 5L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(100L)).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(Tuple1(200L)).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((10L, 100L, 200L), (12L, 100L, 200L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q126 median/MAD and the modified-z flag, by hand") {
    val got = SparkEntry.queries("q126_mad_outliers")(spark, fixtures).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers"))).toMap
    // a: [1,3,4,5] -> med 3.5, adev [2.5,.5,.5,1.5] -> mad 1.0, none flagged
    assert(got("a") == (3.5, 1.0, 0L))
    // b: [2,3,4,100] -> med 3.5, mad 1.0; 0.6745*96.5 > 3.5 -> one outlier
    assert(got("b") == (3.5, 1.0, 1L))
  }

  test("q127 transition counts and row-normalized probabilities") {
    val got = SparkEntry.queries("q127_markov_transitions")(spark, fixtures)
      .collect()
      .map(r => (r.getAs[String]("cur"), r.getAs[String]("next")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Double]("prob"))).toMap
    // u1: a->b, b->a, a->b, b->b; u2: a->b; u3 has no transition
    assert(got(("a", "b")) == (3L, 1.0))
    assert(got(("b", "a")) == (1L, 0.5))
    assert(got(("b", "b")) == (1L, 0.5))
    assert(got.size == 3)
  }

  test("q128 seven-day distinct actives over a sparse day spine") {
    val got = SparkEntry.queries("q128_rolling_active_users")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_active_7d")).toMap
    // day 0: {u1}; day 5 window [-1,5]: {u1,u3}; day 7 window [1,7]: {u2,u3}
    assert(got == Map(0L -> 1L, 5L -> 2L, 7L -> 2L))
  }

  test("q129 counts exactly the planted orphan keys per FK edge") {
    val got = SparkEntry.queries("q129_fk_audit")(spark, fixtures).collect()
      .map(r => r.getAs[String]("fk_edge") -> r.getAs[Long]("n_orphan_keys"))
      .toMap
    assert(got == Map(
      "lineitem->orders" -> 1L, "lineitem->part" -> 0L,
      "lineitem->supplier" -> 0L, "orders->customer" -> 1L,
      "customer->nation" -> 1L))
  }
}
