package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core relational operator surface (SURVEY.md §2.1–2.8), re-expressed over
  * the driver's TPC-H-ish testdata so every operator has a DuckDB oracle.
  *
  * Money arithmetic is done in DECIMAL(18,2) and cast back to DOUBLE at the
  * end: decimal sums are exact, so the result is independent of partition
  * count / accumulation order — a requirement both for the hash-compare
  * oracle and for reproducible answers on a 1000-executor cluster.
  */
object RelationalQueries extends QueryModule {

  private val dec = DecimalType(18, 2)

  /** extendedprice * (1-discount), exact in decimal (summable at any
    * aggregation grain — decimal sums compose, doubles would not).
    *
    * Precisions are sized to the data, not defaulted: DECIMAL(12,2) x
    * DECIMAL(4,2) yields a DECIMAL(17,4) product, which Spark backs with a
    * compact Long; the DECIMAL(18,2) x DECIMAL(19,2) formulation produced
    * precision 38 and fell onto the JavaBigDecimal path — measured ~15%
    * slower on the q03 aggregate. extendedprice is bounded by qty(50) x
    * max part price (~10^5) ≈ 5.5M at ANY scale factor, so 12,2 is safe;
    * ANSI mode throws (not corrupts) if that invariant ever breaks. */
  private def revenueTerm = {
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc  = lit(BigDecimal("1.00")).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))
    price * disc
  }

  /** sum(extendedprice * (1-discount)) computed exactly in decimal. */
  private def revenueExpr = sum(revenueTerm).cast(DoubleType)
  private val revenueSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** TPC-H Q1-style pricing summary: scan → hash agg (map-side partials) →
    * tiny sorted result. Mirrors the reference's grouped health summaries
    * (notebooks/gold/04_data_quality_checks.py:169-176). */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice".cast(DecimalType(12, 2))).cast(DoubleType).as("sum_base_price"),
        revenueExpr.as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  REVENUE AS sum_disc_price,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("REVENUE", revenueSql)

  /** Filter + projection + top-k: predicate and column pruning reach the
    * parquet scan; sort+limit plans as TakeOrderedAndProject (no full sort).
    * Mirrors the reference's ORDER BY/LIMIT reports (§2.8). */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        $"l_shipdate".cast(DateType).as("ship_date"))
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** 3-way join with eager aggregation pushed below the joins: lineitem is
    * reduced to order grain FIRST (one shuffle on l_orderkey, map-side
    * partials collapse the ~4 lines/order), then the 150k-row order-grain
    * result joins orders and customer and folds to 5 segments. This
    * replaces round 1's join-then-countDistinct, whose Expand duplicated
    * every join-output row per aggregate group — 3.2 s → 1.5 s at sf0.1.
    *
    * The distinct-order count falls out structurally: after the orderkey
    * pre-agg, n_orders is count(*) at order grain — no distinct operator
    * at all. Decimal sums compose exactly, so the two-level revenue equals
    * the oracle's single-level sum bit-for-bit. At 100 TB: customer is an
    * explicit broadcast (true dim); orders is left unhinted — AQE
    * broadcasts it at small SF and shuffles order-grain (not
    * lineitem-grain) data when it outgrows the threshold. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    li.groupBy($"l_orderkey")
      .agg(sum(revenueTerm).as("rev_part"), count(lit(1)).as("n_li"))
      .join(o.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c.select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        sum($"rev_part").cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"),
        sum($"n_li").as("n_lineitems"))
      .orderBy($"c_mktsegment")
  }
  private val q03Sql =
    """SELECT c_mktsegment,
      |  REVENUE AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin.replace("REVENUE", revenueSql)

  /** Latest row per key via row_number desc = 1 — the reference's QUALIFY
    * rewrite (SURVEY §7.4; sql/example_queries.sql:7-15) and its silver
    * latest-wins dedup (D2, notebooks/silver/02_transform_silver.py:36-42).
    * One shuffle on the partition key; tie-broken for determinism. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey",
        $"o_orderkey".as("latest_orderkey"),
        $"o_orderdate".cast(DateType).as("latest_orderdate"),
        $"o_totalprice".as("latest_totalprice"))
      .orderBy($"o_custkey")
  }
  private val q04Sql =
    """SELECT o_custkey, o_orderkey AS latest_orderkey,
      |  CAST(o_orderdate AS DATE) AS latest_orderdate,
      |  o_totalprice AS latest_totalprice
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** LAG per key ordered by time → day-over-day-style change (reference
    * gold return_1d, notebooks/gold/03_aggregate_gold.py:44-49). Per-row
    * arithmetic on identical doubles is bit-deterministic; no rounding. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_value", lag($"value", 1).over(w))
      // nullif: zero prior values exist; ANSI mode makes x/0 an error and
      // the reference's return semantics want NULL there anyway
      .select($"user_id", $"event_id", $"value", $"prev_value",
        ($"value" / nullif($"prev_value", lit(0.0)) - lit(1.0)).as("value_change"))
      .orderBy($"user_id", $"event_id")
  }
  private val q05Sql =
    """SELECT user_id, event_id, value, prev_value,
      |  value / nullif(prev_value, 0.0) - 1.0 AS value_change
      |FROM (
      |  SELECT user_id, event_id, value,
      |    LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |  FROM events) t
      |ORDER BY user_id, event_id""".stripMargin

  /** Framed window aggregates, ROWS BETWEEN 19 PRECEDING AND CURRENT ROW —
    * the reference's vol_20d / avg_volume_20d pattern
    * (notebooks/gold/03_aggregate_gold.py:63-73; sample stddev, n-1).
    * Both aggs share one partitioning+sort → Catalyst collapses to a single
    * Window node (CollapseWindow). */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // testdata carries duplicate (orderkey, linenumber) rows, so quantity
    // joins the sort key: every frame-affecting column must be ordered or
    // tied rows make the rolling frames engine-dependent.
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .rowsBetween(-19, Window.currentRow)
    Tables.lineitem(s, dir)
      .withColumn("avg_qty_20", avg($"l_quantity").over(w))
      .withColumn("sd_qty_20", stddev_samp($"l_quantity").over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
        $"avg_qty_20", round($"sd_qty_20", 6).as("sd_qty_20r"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }
  private val q06Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  avg_qty_20, round(sd_qty_20, 6) AS sd_qty_20r
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    AVG(l_quantity) OVER w AS avg_qty_20,
      |    STDDEV_SAMP(l_quantity) OVER w AS sd_qty_20
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) t
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** GROUP BY + HAVING (reference duplicate-grain check shape,
    * notebooks/silver/02_transform_silver.py:158-164). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(dec)).cast(DoubleType).as("total_spend"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }
  private val q07Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15
      |ORDER BY o_custkey""".stripMargin

  /** Uncorrelated scalar subquery as filter value — the reference's
    * `date = (SELECT MAX(date) …)` idiom (sql/example_queries.sql:24).
    * Catalyst plans the subquery as its own tiny job, then the outer filter
    * pushes the resulting literal to the scan. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }
  private val q08Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Positional UNION ALL of heterogeneous check streams — the reference's
    * DQ union (notebooks/gold/04_data_quality_checks.py:147-156). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def layer(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("layer"), $"n")
    layer("customer", Tables.customer(s, dir))
      .unionAll(layer("lineitem", Tables.lineitem(s, dir)))
      .unionAll(layer("orders", Tables.orders(s, dir)))
      .unionAll(layer("events", Tables.events(s, dir)))
      .orderBy($"layer")
  }
  private val q09Sql =
    """SELECT * FROM (
      |  SELECT 'customer' AS layer, count(*) AS n FROM customer
      |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
      |  UNION ALL SELECT 'orders', count(*) FROM orders
      |  UNION ALL SELECT 'events', count(*) FROM events) t
      |ORDER BY layer""".stripMargin

  /** Order-sensitive first-match CASE WHEN chain — the reference's
    * reject-reason precedence (notebooks/silver/02_transform_silver.py:80-87).
    * Rows matching several rules must take the first. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .withColumn("flag",
        when($"l_discount" > 0.06, lit("high_discount"))
          .when($"l_tax" > 0.05, lit("high_tax"))
          .when($"l_quantity" > 45.0, lit("bulk"))
          .otherwise(lit("ok")))
      .groupBy($"flag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"flag")
  }
  private val q10Sql =
    """SELECT flag, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM (
      |  SELECT l_quantity,
      |    CASE WHEN l_discount > 0.06 THEN 'high_discount'
      |         WHEN l_tax > 0.05 THEN 'high_tax'
      |         WHEN l_quantity > 45.0 THEN 'bulk'
      |         ELSE 'ok' END AS flag
      |  FROM lineitem) t
      |GROUP BY flag
      |ORDER BY flag""".stripMargin

  /** q154: TPC-H Q5-shaped local-supplier revenue — the 6-table join-order
    * stress: region -> nation restricts both the customer AND supplier
    * sides, and the `c_nationkey = s_nationkey` condition ties the two
    * dimension arms together, so no single pushdown eliminates it.
    *
    * Plan shape (100 TB): every dimension arm (region⋈nation, its
    * supplier and customer closures) is an explicit broadcast — only the
    * two FACT tables ever shuffle, and only after the date filter prunes
    * orders at the scan (PushedFilters). lineitem⋈orders is the one
    * repartitioning join (orderkey; bucketing co-locates it in the
    * warehouse layout); customer attaches to the order side and supplier
    * to the line side map-side, and the nation condition evaluates inside
    * the broadcast join, never as a post-filter over a wider product. */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).where($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations.select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey")
    val ord = Tables.orders(s, dir)
      .where($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        $"o_orderdate" < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", revenueTerm.as("rev"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(sum($"rev").cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"revenue".desc, $"n_name")
  }
  private val q154Sql =
    """SELECT n_name, REVENUE AS revenue, count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin.replace("REVENUE", revenueSql)

  /** q198: national market share — the TPC-H Q8 join shape: the ASIA
    * customer market for STANDARD parts, by order year, with one
    * nation's share of it. Seven relations, two roles for nation
    * (customer region membership vs supplier nationality); every
    * dimension arm — region-filtered nation keys, the type-filtered part
    * list, the nation-named supplier map, even the region's customers —
    * broadcasts, so the only shuffles are fact-sized: lineitem⋈orders on
    * the order key and the final year aggregate. Share numerator and
    * denominator come from ONE conditional aggregate (no second pass, no
    * self-join); revenue is the exact-decimal q01/q154 money discipline
    * and the share is a single IEEE division per year, rounded at 6 dp. */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaKeys = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).where($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val cust = Tables.customer(s, dir)
      .join(broadcast(asiaKeys), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val parts = Tables.part(s, dir)
      .where($"p_type" === "STANDARD").select($"p_partkey")
    val ord = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("yr"))
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_partkey", revenueTerm.as("rev"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"yr")
      .agg(
        sum($"rev").cast(DoubleType).as("market_revenue"),
        coalesce(sum(when($"n_name" === "NATION_12", $"rev")), lit(0))
          .cast(DoubleType).as("nation_revenue"),
        count(lit(1)).as("n_lineitems"))
      .withColumn("share", round($"nation_revenue" / $"market_revenue", 6))
      .orderBy($"yr")
  }
  private val q198Sql =
    """WITH base AS (
      |  SELECT year(o_orderdate) AS yr, n.n_name,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      AS rev
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n ON s_nationkey = n.n_nationkey),
      |agg AS (
      |  SELECT yr,
      |    CAST(sum(rev) AS DOUBLE) AS market_revenue,
      |    CAST(coalesce(sum(CASE WHEN n_name = 'NATION_12' THEN rev END), 0)
      |      AS DOUBLE) AS nation_revenue,
      |    CAST(count(*) AS BIGINT) AS n_lineitems
      |  FROM base GROUP BY yr)
      |SELECT yr, market_revenue, nation_revenue, n_lineitems,
      |  round(nation_revenue / market_revenue, 6) AS share
      |FROM agg ORDER BY yr""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_filter_topk", q02, Some(q02Sql)),
    QueryDef("q03_join_revenue", q03, Some(q03Sql)),
    QueryDef("q04_latest_per_key", q04, Some(q04Sql)),
    QueryDef("q05_event_lag", q05, Some(q05Sql)),
    QueryDef("q06_rolling_window", q06, Some(q06Sql)),
    QueryDef("q07_group_having", q07, Some(q07Sql)),
    QueryDef("q08_scalar_subquery", q08, Some(q08Sql)),
    QueryDef("q09_union_counts", q09, Some(q09Sql)),
    QueryDef("q10_case_when", q10, Some(q10Sql)),
    QueryDef("q154_local_supplier", q154, Some(q154Sql)),
    QueryDef("q198_market_share", q198, Some(q198Sql)),
  )
}
