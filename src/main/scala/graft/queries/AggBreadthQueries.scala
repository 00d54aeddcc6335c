package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional aggregation breadth beyond the reference's GROUP BY:
  * rollup, cube, grouping sets, and the approximate-distinct scale path.
  * The reference has none of these (SURVEY §2.5 notes their absence) — they
  * are part of the engine's first-class analytics surface.
  */
object AggBreadthQueries extends QueryModule {

  private val dec = DecimalType(18, 2)

  /** q39: ROLLUP over (returnflag, linestatus) — subtotals + grand total.
    * grouping() disambiguates real NULLs from rollup NULLs. */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_flag"),
        grouping($"l_linestatus").cast("int").as("g_status"))
      .orderBy($"g_flag", $"g_status", $"l_returnflag", $"l_linestatus")
  }
  private val q39Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin

  /** q40: CUBE over (orderstatus, orderpriority) — all 2^2 grouping
    * combinations in one pass (Spark expands to a single expand+agg). */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(dec)).cast(DoubleType).as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio", $"o_orderstatus", $"o_orderpriority")
  }
  private val q40Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin

  /** q41: explicit GROUPING SETS — by-nation and by-segment marginals of
    * the same join, one scan. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    s.sql(
      """SELECT n_name, c_mktsegment, count(*) AS n,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY g_nation, g_seg, n_name, c_mktsegment""".stripMargin)
  }
  private val q41Sql =
    """SELECT n_name, c_mktsegment, count(*) AS n,
      |  CAST(GROUPING(n_name) AS INT) AS g_nation,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
      |ORDER BY g_nation, g_seg, n_name, c_mktsegment""".stripMargin

  /** q42: approximate distinct (HLL++) next to the exact count — the scale
    * path for A2 (SURVEY §2.5: exact distinct shuffles every key; HLL is a
    * constant-size sketch, mergeable map-side). HLL estimates are
    * engine-specific, so the oracle checks the EXACT column and the
    * approx's relative-error BOUND, not the sketch value itself. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // exact and approx in separate aggregations joined on the group key:
    // mixing them in one agg makes Catalyst Expand every row 2x and fall
    // off the partial-agg fast path — measured ~2x slower than this shape.
    val base = Tables.lineitem(s, dir).select($"l_returnflag", $"l_orderkey")
    val exact = base.distinct()
      .groupBy($"l_returnflag").agg(count(lit(1)).as("exact_nd"))
    val approx = base
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_nd"))
    exact.join(approx, "l_returnflag")
      .select($"l_returnflag", $"exact_nd",
        // checked claim: the estimate lands within 5x the configured 2% rsd
        ($"approx_nd" > $"exact_nd" * 0.9 && $"approx_nd" < $"exact_nd" * 1.1)
          .as("approx_within_bound"))
      .orderBy($"l_returnflag")
  }
  private val q42Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS exact_nd,
      |  TRUE AS approx_within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q159: exact percentile family — median / p25 / p75 / p95 of quantity
    * per return flag via the EXACT `percentile` aggregate (sort-based
    * within group), against DuckDB's `quantile_cont`. Quantities are
    * integer-valued and the probed fractions are dyadic (÷4, ÷20 of
    * integer gaps ≤ 50), so linear interpolation is float-exact under
    * either engine's formulation — no rounding ambiguity at the oracle
    * boundary. Exact percentiles buffer each group's values: the
    * sketched path for corpus scale is q66's GK quantiles (bounded
    * memory, mergeable partials); this gate pins the exact semantics
    * those sketches approximate. */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("median(l_quantity)").as("med"),
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_quantity, 0.95)").as("p95"))
      .orderBy($"l_returnflag")
  }
  private val q159Sql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  median(l_quantity) AS med,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_quantity, 0.95) AS p95
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q173: several DISTINCT aggregates over DIFFERENT columns in one
    * grouped pass plus a plain aggregate alongside. Catalyst plans this
    * with Expand (one row replica per distinct branch) feeding a two-level
    * aggregate — the shape that silently multiplies the shuffle by the
    * branch count, which is why it gets its own gate: the engine must
    * produce it correctly, and a reader of the plan should see Expand, not
    * N self-joins. */
  private def q173(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("nd_parts"),
        countDistinct($"l_suppkey").as("nd_supps"),
        countDistinct($"l_partkey", $"l_suppkey").as("nd_pairs"),
        count(lit(1)).as("n_rows"),
        sum($"l_quantity").cast("long").as("sum_qty"))
      .orderBy($"l_returnflag")
  }
  private val q173Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS nd_parts,
      |  count(DISTINCT l_suppkey) AS nd_supps,
      |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_pairs,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q177: boolean aggregate family — bool_and / bool_or (ANSI EVERY /
    * ANY) plus count_if, per group. All three are map-side combinable
    * (AND/OR/SUM partials), so the 100 TB shape is the same one-exchange
    * grouped pass as any sum; DuckDB lacks count_if as a stable name, so
    * the oracle spells it as the equivalent conditional sum. */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("bool_and(l_quantity > 0)").as("all_qty_positive"),
        expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
        expr("bool_and(l_tax < 0.09)").as("all_low_tax"),
        expr("count_if(l_discount = 0)").as("n_no_discount"))
      .orderBy($"l_returnflag")
  }
  private val q177Sql =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_qty_positive,
      |  bool_or(l_discount > 0.09) AS any_deep_discount,
      |  bool_and(l_tax < 0.09) AS all_low_tax,
      |  CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_discount
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q184: deterministic MODE — the most frequent quantity per return
    * flag. Native `mode()` exists in both engines but neither PINS its
    * tie-break (Spark and DuckDB may return different members of a tied
    * class, and either may change across versions), so an engine gate
    * cannot use it: the pinned formulation is count-then-rank with an
    * explicit total order (count desc, value asc), which IS the mode plus
    * a deterministic tie policy. Shape: one grouped count (map-side
    * combinable on the (flag, qty) pair key) feeding a per-flag top-1 —
    * the rank window partitions on flag over |distinct qty| ≤ 50 rows per
    * group, so the sort after the exchange is trivial at any corpus
    * size. Quantities are integral doubles; CAST pins the output type. */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"mode_n".desc, $"mode_qty".asc)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_quantity".cast("long").as("mode_qty"))
      .agg(count(lit(1)).as("mode_n"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_returnflag", $"mode_qty", $"mode_n")
      .orderBy($"l_returnflag")
  }
  private val q184Sql =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_qty,
      |    CAST(count(*) AS BIGINT) AS mode_n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY mode_n DESC, mode_qty ASC) AS rn
      |  FROM c)
      |SELECT l_returnflag, mode_qty, mode_n FROM r WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q39_rollup", q39, Some(q39Sql)),
    QueryDef("q40_cube", q40, Some(q40Sql)),
    QueryDef("q41_grouping_sets", q41, Some(q41Sql)),
    QueryDef("q42_approx_distinct", q42, Some(q42Sql)),
    QueryDef("q159_exact_percentiles", q159, Some(q159Sql)),
    QueryDef("q173_multi_distinct", q173, Some(q173Sql)),
    QueryDef("q177_bool_aggs", q177, Some(q177Sql)),
    QueryDef("q184_mode_pinned", q184, Some(q184Sql)),
  )
}
