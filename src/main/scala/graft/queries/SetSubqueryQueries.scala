package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Set operations and subquery shapes beyond the reference's UNION ALL
  * (SURVEY §2.7 notes INTERSECT/EXCEPT are absent from the reference):
  * INTERSECT/EXCEPT, IN / NOT IN subqueries, and a correlated scalar
  * subquery — each a distinct Catalyst planning path (set-op to
  * semi/anti-join rewrites, subquery de-correlation to joins).
  */
object SetSubqueryQueries extends QueryModule {

  /** q43: INTERSECT / EXCEPT (distinct set semantics — planned as
    * left-semi / left-anti joins with dedup). Compares the customer-key
    * populations of two order-status slices. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val p = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    def tag(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("set_op"), $"n")
    tag("f_intersect_p", f.intersect(p))
      .unionAll(tag("f_except_p", f.except(p)))
      .unionAll(tag("p_except_f", p.except(f)))
      .orderBy($"set_op")
  }
  private val q43Sql =
    """SELECT * FROM (
      |  SELECT 'f_intersect_p' AS set_op, count(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') t1
      |  UNION ALL
      |  SELECT 'f_except_p', count(*) FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') t2
      |  UNION ALL
      |  SELECT 'p_except_f', count(*) FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |    EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t3) u
      |ORDER BY set_op""".stripMargin

  /** q44: IN / NOT IN subqueries (semi/anti with null-aware planning). */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer").foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_with_urgent
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }
  private val q44Sql =
    """SELECT c_mktsegment, count(*) AS n_with_urgent
      |FROM customer
      |WHERE c_custkey IN (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q45: correlated scalar subquery — per-customer max order value inline
    * (Catalyst de-correlates to an aggregate + left outer join). */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer").foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT c_custkey,
        |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        |FROM customer
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin)
  }
  private val q45Sql =
    """SELECT c_custkey,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
      |FROM customer
      |WHERE c_custkey <= 200
      |ORDER BY c_custkey""".stripMargin

  /** q46: full outer join with coalesced keys — reconciliation shape (rows
    * on either side survive; SMJ on the join key). */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySeg = Tables.customer(s, dir).groupBy($"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("n_customers"))
    val byStatus = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .filter($"o_orderstatus" === "P")
      .groupBy($"c_mktsegment".as("seg2"))
      .agg(countDistinct($"c_custkey").as("n_pending_customers"))
    bySeg.join(byStatus, $"seg" === $"seg2", "full_outer")
      .select(coalesce($"seg", $"seg2").as("segment"),
        coalesce($"n_customers", lit(0L)).as("n_customers"),
        coalesce($"n_pending_customers", lit(0L)).as("n_pending_customers"))
      .orderBy($"segment")
  }
  private val q46Sql =
    """WITH a AS (SELECT c_mktsegment AS seg, count(*) AS n_customers
      |  FROM customer GROUP BY 1),
      |b AS (SELECT c_mktsegment AS seg2, count(DISTINCT c_custkey) AS n_pending_customers
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus = 'P' GROUP BY 1)
      |SELECT coalesce(seg, seg2) AS segment,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_pending_customers, 0) AS n_pending_customers
      |FROM a FULL OUTER JOIN b ON seg = seg2
      |ORDER BY segment""".stripMargin

  /** q161: TPC-H Q17-shaped correlated AGGREGATE subquery at FACT grain —
    * lineitems whose quantity sits below 20% of their part's average
    * (small-lot orders). Where q45 correlates against a dim row, here the
    * correlation key is the fact table's own foreign key, so
    * decorrelation must plan the subquery as a full per-part aggregate
    * joined back to lineitem (one agg + one join on l_partkey, both
    * hash-shuffled on the same key → exchange reuse), never per-row
    * re-execution. Threshold arithmetic stays exact: quantities are
    * integral, `0.2 * avg` is one double product both engines compute
    * identically from the same exact sum/count. */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem").foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q161Text)
  }
  private val q161Text =
    """SELECT l_partkey,
      |  CAST(count(*) AS BIGINT) AS n_small_lots,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem l1
      |WHERE l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY l_partkey
      |ORDER BY l_partkey""".stripMargin

  /** q155: INTERSECT ALL / EXCEPT ALL — MULTISET semantics (q43's set
    * forms dedup; these preserve multiplicity: intersect keeps
    * min(m, n) copies, except keeps max(m - n, 0)). Catalyst plans both
    * via the generated-count rewrite (RewriteIntersectAll /
    * RewriteExceptAll: tag each side, sum counts per row value, re-expand
    * with Generate) — no row ever leaves its hash bucket, so the shape
    * is one shuffle on the full row value, same as a groupBy on it.
    * Compared bags: (lang, size-bucket) occurrences of even- vs
    * odd-numbered sources; the result re-aggregates so the gate pins
    * exact surviving multiplicities. */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .withColumn("src_num", regexp_extract($"source", "([0-9]+)$", 1).cast("int"))
      .withColumn("bucket", expr("n_chars div 100"))
    val even = d.filter($"src_num" % 2 === 0).select($"lang", $"bucket")
    val odd  = d.filter($"src_num" % 2 === 1).select($"lang", $"bucket")
    def agg(name: String, df: DataFrame) =
      df.groupBy($"lang", $"bucket").agg(count(lit(1)).as("n"))
        .select(lit(name).as("set_op"), $"lang", $"bucket", $"n")
    agg("even_intersect_all_odd", even.intersectAll(odd))
      .unionAll(agg("even_except_all_odd", even.exceptAll(odd)))
      .orderBy($"set_op", $"lang", $"bucket")
  }
  private val q155Sql =
    """WITH d AS (SELECT lang, n_chars // 100 AS bucket,
      |    CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) AS src_num
      |  FROM documents),
      |ev AS (SELECT lang, bucket FROM d WHERE src_num % 2 = 0),
      |od AS (SELECT lang, bucket FROM d WHERE src_num % 2 = 1),
      |ia AS (SELECT * FROM ev INTERSECT ALL SELECT * FROM od),
      |ea AS (SELECT * FROM ev EXCEPT ALL SELECT * FROM od)
      |SELECT 'even_intersect_all_odd' AS set_op, lang, bucket,
      |  count(*) AS n FROM ia GROUP BY lang, bucket
      |UNION ALL
      |SELECT 'even_except_all_odd', lang, bucket, count(*) FROM ea
      |GROUP BY lang, bucket
      |ORDER BY set_op, lang, bucket""".stripMargin

  /** q186: "only late supplier" — the TPC-H Q21 join shape: suppliers
    * charged with an order's delay when the order had other suppliers
    * (EXISTS) and none of the others was late (NOT EXISTS), counted and
    * top-10'd. Late = shipped more than 60 days after the order date.
    * The Spark side deliberately does NOT stack two correlated
    * subqueries: after the per-(order, supplier) lateness flags, "some
    * other supplier exists / no other late supplier" is ONE grouped
    * aggregate per order (supplier count, late count, the unique late
    * key via max-over-when) — two scans of the flag table become one,
    * the 100 TB-relevant difference, while the DuckDB oracle keeps the
    * literal EXISTS / NOT EXISTS formulation so the two shapes
    * cross-check each other. Top-10 cut (count desc, suppkey tie-break)
    * runs before the supplier-name join, which then broadcasts 10 rows. */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate")
    val flags = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .cast("long")).as("late"))
    val faults = flags.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("ns"), sum($"late").as("nl"),
        max(when($"late" === 1L, $"l_suppkey")).as("s_suppkey"))
      .filter($"ns" >= 2 && $"nl" === 1L)
    val top = faults.groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_fault_orders"))
      .orderBy($"n_fault_orders".desc, $"s_suppkey")
      .limit(10)
    top.join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        Seq("s_suppkey"))
      .select($"s_suppkey", $"s_name", $"n_fault_orders")
      .orderBy($"n_fault_orders".desc, $"s_suppkey")
  }
  private val q186Sql =
    """WITH ls AS (
      |  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
      |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |        THEN 1 ELSE 0 END) AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT s1.ok, s1.sk FROM ls s1
      |  WHERE s1.late = 1
      |    AND EXISTS (SELECT 1 FROM ls s2
      |      WHERE s2.ok = s1.ok AND s2.sk <> s1.sk)
      |    AND NOT EXISTS (SELECT 1 FROM ls s3
      |      WHERE s3.ok = s1.ok AND s3.sk <> s1.sk AND s3.late = 1))
      |SELECT f.sk AS s_suppkey, s.s_name,
      |  CAST(count(*) AS BIGINT) AS n_fault_orders
      |FROM f JOIN supplier s ON f.sk = s.s_suppkey
      |GROUP BY 1, 2
      |ORDER BY n_fault_orders DESC, s_suppkey LIMIT 10""".stripMargin

  /** q350: TPC-H Q22-shaped dormant-rich-customer report — the
    * three-clause composition Q22 exercises: (1) an uncorrelated SCALAR
    * subquery in the filter (balance above the positive-balance
    * average), (2) a NOT EXISTS anti-join (no urgent order — the
    * synthetic data gives every customer SOME order, so the textbook
    * "no orders at all" arm would gate an empty set), (3) a grouped
    * roll-up of the survivors by nation. The average comparison is
    * EXACT: instead of avg()'s order-dependent double, both engines
    * compare cents·n > Σcents by integer cross-multiplication (cents ≤
    * 10⁶, n ≤ 10⁷ at sf100 → product < 2^53; the money-discipline form
    * of the scalar-subquery filter). Balances roll up in cents (BIGINT)
    * for the same reason.
    *
    * Scale shape: the stats row is a 1-row broadcast (no collect); the
    * anti-join shuffles on custkey against the pre-filtered urgent
    * slice; the final aggregate is map-side combinable on nationkey.
    * Spark builds the anti-join directly (left_anti) — the same plan
    * Catalyst de-correlates NOT EXISTS into, which the oracle runs
    * literally. */
  private def q350(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cc = Tables.customer(s, dir)
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long").as("cents"))
    val st = cc.filter($"cents" > 0)
      .agg(sum($"cents").as("s_cents"), count(lit(1)).as("n_pos"))
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    cc.crossJoin(broadcast(st))
      .filter($"cents" * $"n_pos" > $"s_cents")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum($"cents").as("total_cents"))
      .orderBy($"c_nationkey")
  }
  private val q350Sql =
    """WITH cc AS (SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      |st AS (SELECT CAST(sum(cents) AS BIGINT) AS s_cents,
      |    CAST(count(*) AS BIGINT) AS n_pos FROM cc WHERE cents > 0),
      |sel AS (SELECT cc.c_nationkey, cc.cents
      |  FROM cc CROSS JOIN st
      |  WHERE cc.cents * st.n_pos > st.s_cents
      |    AND NOT EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = cc.c_custkey
      |        AND o.o_orderpriority = '1-URGENT'))
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q350_dormant_rich", q350, Some(q350Sql)),
    QueryDef("q43_intersect_except", q43, Some(q43Sql)),
    QueryDef("q44_in_subquery", q44, Some(q44Sql)),
    QueryDef("q45_correlated_scalar", q45, Some(q45Sql)),
    QueryDef("q46_full_outer_join", q46, Some(q46Sql)),
    QueryDef("q155_multiset_ops", q155, Some(q155Sql)),
    QueryDef("q161_below_avg_lots", q161, Some(q161Text)),
    QueryDef("q186_only_late_supplier", q186, Some(q186Sql)),
    QueryDef("q202_null_safe_join", q202, Some(q202Sql)),
  )

  /** q202: null-safe equality join — Spark's `<=>` (ANSI IS NOT DISTINCT
    * FROM): NULL keys MATCH each other where plain `=` silently drops
    * them, the classic bug when a bucketing expression can produce NULL
    * on both sides. Buckets derive NULL from data (nullif on a modulus),
    * view counts join click counts per bucket, and the NULL-bucket row
    * appearing in the output IS the semantics under test — rerunning
    * with `=` loses exactly that row, which the handcheck pins. Plans as
    * an ordinary hash join (null-safe equality is still an equi-join
    * key, hashed with NULL as a value); no nested-loop fallback. */
  private def q202(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def buckets(tpe: String, out: String) = Tables.events(s, dir)
      .filter($"event_type" === tpe)
      .groupBy(nullif(pmod(round($"value").cast("long"), lit(10L)), lit(0L))
        .as("bucket"))
      .agg(count(lit(1)).as(out))
    val v = buckets("view", "n_views")
    val c = buckets("click", "n_clicks").withColumnRenamed("bucket", "cb")
    v.join(c, $"bucket" <=> $"cb", "inner")
      .select($"bucket", $"n_views", $"n_clicks")
      .orderBy($"bucket".asc_nulls_first)
  }
  // The oracle mirrors Spark's pmod (non-negative residue) via the
  // ((x % 10) + 10) % 10 identity so engine and oracle agree even if
  // events.value were ever negative (DuckDB's bare % keeps the sign).
  private val q202Sql =
    """WITH v AS (
      |  SELECT nullif(((CAST(round(value) AS BIGINT) % 10) + 10) % 10, 0) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n_views
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT nullif(((CAST(round(value) AS BIGINT) % 10) + 10) % 10, 0) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n_clicks
      |  FROM events WHERE event_type = 'click' GROUP BY 1)
      |SELECT v.bucket, v.n_views, c.n_clicks
      |FROM v JOIN c ON v.bucket IS NOT DISTINCT FROM c.bucket
      |ORDER BY v.bucket ASC NULLS FIRST""".stripMargin
}
