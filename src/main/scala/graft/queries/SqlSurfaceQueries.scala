package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text surface: queries submitted as ANSI SQL strings through
  * `spark.sql` — the parser/analyzer path a SQL-first consumer of this
  * engine uses — covering correlated EXISTS / NOT EXISTS rewrites and
  * native recursive CTEs (Spark 4.x `WITH RECURSIVE`).
  */
object SqlSurfaceQueries extends QueryModule {

  private def withViews(s: SparkSession, dir: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** q137: correlated EXISTS + NOT EXISTS, as SQL text — customers with a
    * big-ticket order and no failed order. Catalyst rewrites the pair
    * into a left-semi and a left-anti join (RewritePredicateSubquery), so
    * the plan is two hash joins, not per-row subquery evaluation; the
    * gate proves the SQL path gives the same answer DuckDB's does. */
  private def q137(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "customer", "orders")(q137Text)
  private val q137Text =
    """SELECT c.c_custkey, c.c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      |ORDER BY c.c_custkey""".stripMargin

  /** q138: native recursive CTE — walk the implicit binary-tree hierarchy
    * parent(k) = k div 2 over part keys from the root (key 0) and report
    * per-level population. Structurally acyclic (the k <> parent guard
    * breaks 0's self-edge), so depth is ~log₂|parts| and each recursion
    * step is ONE equi-join of the frontier against the part table —
    * exactly the iterative-BFS shape q94 builds by hand, here delegated
    * to the engine's UnionLoop execution. DuckDB runs the same statement
    * natively, so the oracle is near-verbatim. */
  private def q138(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "part")(
      """WITH RECURSIVE t(k, d) AS (
        |  SELECT CAST(0 AS BIGINT) AS k, 0 AS d
        |  UNION ALL
        |  SELECT p.p_partkey AS k, t.d + 1 AS d
        |  FROM part p JOIN t ON p.p_partkey div 2 = t.k
        |  WHERE p.p_partkey <> t.k
        |)
        |SELECT d AS depth, CAST(count(*) AS BIGINT) AS n_keys,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM t GROUP BY d ORDER BY d""".stripMargin)
  private val q138Sql =
    """WITH RECURSIVE t(k, d) AS (
      |  SELECT CAST(0 AS BIGINT) AS k, 0 AS d
      |  UNION ALL
      |  SELECT p.p_partkey AS k, t.d + 1 AS d
      |  FROM part p JOIN t ON p.p_partkey // 2 = t.k
      |  WHERE p.p_partkey <> t.k
      |)
      |SELECT d AS depth, CAST(count(*) AS BIGINT) AS n_keys,
      |  min(k) AS min_key, max(k) AS max_key
      |FROM t GROUP BY d ORDER BY d""".stripMargin

  /** q157: bitwise aggregates, as SQL text — per order, the bitmask of
    * line numbers present (`bit_or(1 << l_linenumber)`), then the
    * distribution of masks plus `bit_and`/`bit_xor` folds over each
    * mask population. The bitmap-profile idiom (set-of-small-ints as one
    * integer) shuffles a single LONG per order instead of a collected
    * set, and every bit op is associative+commutative, so map-side
    * partial aggregation applies at both levels. */
  private def q157(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "lineitem")(q157Text)
  private val q157Text =
    """WITH m AS (SELECT l_orderkey,
      |    bit_or(CAST(1 AS BIGINT) << l_linenumber) AS mask
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT mask, CAST(count(*) AS BIGINT) AS n_orders,
      |  bit_and(l_orderkey) AS and_fold, bit_xor(l_orderkey) AS xor_fold
      |FROM m JOIN lineitem USING (l_orderkey)
      |GROUP BY mask ORDER BY mask""".stripMargin

  /** q158: ordered string aggregation (`LISTAGG ... WITHIN GROUP`) — the
    * deterministic CSV roll-up reporting layers ask for. Inner distinct
    * collapses to (source, lang) grain FIRST (a tiny agg), so the
    * listagg's per-group sort frame is |langs|, never |docs| — the
    * listagg-over-raw-rows formulation would sort every document string
    * through one exchange. DuckDB's `string_agg(... ORDER BY ...)` is the
    * same operator, so the oracle pins byte-equal concatenation. */
  private def q158(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "documents")(
      """WITH sl AS (SELECT DISTINCT source, lang FROM documents)
        |SELECT source,
        |  listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs,
        |  CAST(count(*) AS BIGINT) AS n_langs
        |FROM sl GROUP BY source ORDER BY source""".stripMargin)
  private val q158Sql =
    """WITH sl AS (SELECT DISTINCT source, lang FROM documents)
      |SELECT source,
      |  string_agg(lang, ',' ORDER BY lang) AS langs,
      |  CAST(count(*) AS BIGINT) AS n_langs
      |FROM sl GROUP BY source ORDER BY source""".stripMargin

  /** q162: GROUP BY ALL / ORDER BY ALL — the analyst-SQL sugar both
    * engines resolve to the full non-aggregate column list; the SAME
    * statement text runs on both, so the gate pins the resolution rule,
    * not just the result. */
  private def q162(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "lineitem")(q162Text)
  private val q162Text =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin

  /** q185: aggregate FILTER clause, as SQL text — the ANSI per-aggregate
    * predicate (`agg(x) FILTER (WHERE p)`), run verbatim on both engines.
    * Catalyst rewrites each FILTER into the aggregate's conditional form
    * during planning, so the plan is STILL one grouped pass (no
    * per-predicate scans — same HashAggregate shape as q177's spelled-out
    * conditionals); the gate pins the parser/semantics, including the
    * interaction with count(*) vs count(col) and an avg whose filter
    * excludes all rows of a group (NULL, not 0). Money goes through cents
    * so sums are exact; the one avg is guarded onto an integer lattice
    * (sum of cents / count both exact, one IEEE division). */
  private def q185(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "lineitem")(q185Text)
  private val q185Text =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_all,
      |  CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_deep_disc,
      |  CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    FILTER (WHERE l_linestatus = 'F'), 0) AS BIGINT) AS cents_f,
      |  round(avg(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    FILTER (WHERE l_quantity >= 49) / 100.0, 6) AS avg_price_heavy,
      |  CAST(count(*) FILTER (WHERE l_tax = 0 AND l_discount = 0) AS BIGINT)
      |    AS n_clean
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q194: ordered-set aggregates — ANSI `percentile_disc / percentile_cont
    * … WITHIN GROUP (ORDER BY …)`, run as the same SQL text on both
    * engines. percentile_disc must SELECT AN ACTUAL ELEMENT (smallest
    * value whose cumulative distribution reaches p — no interpolation),
    * which both engines implement identically; percentile_cont
    * interpolates on the q159 dyadic lattice so the doubles are exact.
    * The disc/cont pair in one statement pins that the engine keeps the
    * two semantics distinct — the regression this guards is an engine
    * quietly aliasing one to the other. */
  private def q194(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir, "lineitem")(q194Text)
  private val q194Text =
    """SELECT l_returnflag,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_med_disc,
      |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS qty_p90_disc,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_med_cont,
      |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS qty_p25_cont,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q137_correlated_exists", q137, Some(q137Text)),
    QueryDef("q185_filter_clause", q185, Some(q185Text)),
    QueryDef("q194_ordered_set_aggs", q194, Some(q194Text)),
    QueryDef("q138_recursive_cte", q138, Some(q138Sql)),
    QueryDef("q157_bit_aggs", q157, Some(q157Text)),
    QueryDef("q158_listagg", q158, Some(q158Sql)),
    QueryDef("q162_group_by_all", q162, Some(q162Text)),
  )
}
