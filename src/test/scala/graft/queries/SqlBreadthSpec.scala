package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic handchecks for the SQL-breadth batch (q184–q188): tiny
  * fixtures with closed-form answers run through the REAL
  * `SparkEntry.queries` entries, plus gate-corpus invariants for the
  * allocation (exact-sum, ±1 proportionality) and attribution
  * (conservation of purchases) queries.
  */
class SqlBreadthSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private val gate = "/root/testdata/sf0.001"

  private lazy val fixtures: String = {
    val dir = tmpDir("sqlbreadth")
    // mode: flag A has qty 3×2 vs 5×2 (tie -> smaller wins), flag B 7×1
    // vs 4×2 (clear winner 4); shipdates make order 20 a single-fault
    // order (supp 1 late, supp 2 on time), order 30 all-late (excluded),
    // order 10 single-supplier (excluded)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def d(days: Int) = new java.sql.Timestamp(
      t0.getTime + days * 86400000L)
    Seq(
      // (orderkey, suppkey, linenumber, qty, price, disc, tax, flag, status, shipdate)
      (10L, 1L, 1, 3.0, 100.0, 0.0, 0.0, "A", "F", d(100)),
      (10L, 1L, 2, 3.0, 100.0, 0.0, 0.0, "A", "F", d(10)),
      (20L, 1L, 1, 5.0, 100.0, 0.0, 0.0, "A", "F", d(100)),
      (20L, 2L, 2, 5.0, 100.0, 0.0, 0.0, "A", "F", d(10)),
      (30L, 1L, 1, 7.0, 100.0, 0.0, 0.0, "B", "F", d(90)),
      (30L, 2L, 2, 4.0, 100.0, 0.0, 0.0, "B", "F", d(90)),
      (30L, 3L, 3, 4.0, 100.0, 0.0, 0.0, "B", "F", d(10)))
      .toDF("l_orderkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, t0), (20L, t0), (30L, t0))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "Supp#1"), (2L, "Supp#2"), (3L, "Supp#3"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // attribution: v -> p (view credited), then c -> p (click credited),
    // and a first-touchless purchase (direct)
    Seq(
      (1L, 1L, 5L, "purchase", 10.00), // before any touch -> direct
      (2L, 10L, 5L, "view", 0.0),
      (3L, 20L, 5L, "purchase", 2.50), // credited to view
      (4L, 30L, 5L, "click", 0.0),
      (5L, 40L, 5L, "purchase", 1.00), // credited to click
      (6L, 50L, 6L, "signup", 0.0), // non-channel event: invisible
      (7L, 60L, 6L, "purchase", 4.00)) // direct (signup is not a touch)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q184 mode tie-break picks the smaller value; clear winners win") {
    val r = run("q184_mode_pinned", fixtures).collect()
      .map(x => x.getAs[String]("l_returnflag") ->
        (x.getAs[Long]("mode_qty"), x.getAs[Long]("mode_n"))).toMap
    assert(r("A") == ((3L, 2L))) // 3 and 5 both appear twice -> 3 wins
    assert(r("B") == ((4L, 2L))) // 4 beats 7 on count
  }

  test("q185 FILTER that excludes a whole group yields NULL avg, 0 sum") {
    val r = run("q185_filter_clause", fixtures).collect()
      .map(x => x.getAs[String]("l_returnflag") -> x).toMap
    // no fixture row has qty >= 49 -> avg FILTER is NULL for both groups
    assert(r("A").isNullAt(r("A").fieldIndex("avg_price_heavy")))
    assert(r("B").isNullAt(r("B").fieldIndex("avg_price_heavy")))
    // coalesced sum stays 0-valued, never NULL (flag A: status F rows)
    assert(r("A").getAs[Long]("cents_f") == 7 * 10000L - 3 * 10000L)
    assert(r("A").getAs[Long]("n_all") == 4L && r("B").getAs[Long]("n_all") == 3L)
  }

  test("q186 charges exactly the sole late supplier of a multi-supplier order") {
    val r = run("q186_only_late_supplier", fixtures).collect()
    // order 10: single supplier (excluded); order 30: two late (excluded);
    // order 20: supp 1 late, supp 2 clean -> the only fault
    assert(r.length == 1)
    assert(r(0).getAs[Long]("s_suppkey") == 1L)
    assert(r(0).getAs[String]("s_name") == "Supp#1")
    assert(r(0).getAs[Long]("n_fault_orders") == 1L)
  }

  test("q187 allocation sums exactly to the budget and stays within 1 of pro-rata") {
    val rows = run("q187_largest_remainder", gate).collect()
    val total = rows.map(_.getAs[Long]("alloc_units")).sum
    assert(total == 1000000L, s"allocation must spend the budget exactly, got $total")
    val t = rows.map(_.getAs[Long]("rev_cents")).sum
    rows.foreach { x =>
      val exact = 1000000.0 * x.getAs[Long]("rev_cents") / t
      val got = x.getAs[Long]("alloc_units").toDouble
      assert(math.abs(got - exact) < 1.0 + 1e-9,
        s"${x.getAs[String]("n_name")}: $got vs $exact")
    }
  }

  test("q188 credits view/click last-touch and leaves the rest direct") {
    val r = run("q188_attribution", fixtures).collect()
      .map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("n_purchases"), x.getAs[Double]("revenue"))).toMap
    assert(r("view") == ((1L, 2.50)))
    assert(r("click") == ((1L, 1.00)))
    assert(r("direct") == ((2L, 14.00)))
  }

  test("q188 conserves purchases on the gate corpus") {
    val attributed = run("q188_attribution", gate)
      .agg(sum($"n_purchases")).collect()(0).getLong(0)
    val purchases = graft.Tables.events(spark, gate)
      .filter($"event_type" === "purchase").count()
    assert(attributed == purchases)
  }
}
