package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Scalar-function surface (SURVEY §2.9), distinct/dedup, min-max coverage,
  * null audits, top-k per group, pivot, and sessionization.
  */
object ScalarWindowQueries extends QueryModule {

  /** Complete scalar library of the reference in one projection:
    * regexp_extract, concat, greatest/least, abs, length, upper, substring,
    * arithmetic (SURVEY §2.9 — this is the entire function list; the
    * reference has zero UDFs). Per-row on identical inputs → bit-exact. */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(
        $"p_partkey",
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        greatest($"p_size", lit(25)).as("size_hi"),
        least($"p_size", lit(25)).as("size_lo"),
        abs($"p_retailprice" - lit(1000.0)).as("price_dev"),
        length($"p_name").as("name_len"),
        upper($"p_brand").as("brand_uc"),
        substring($"p_type", 1, 5).as("type_prefix"),
        ($"p_retailprice" * lit(2.0) - $"p_size").as("arith"))
      .orderBy($"p_partkey")
  }
  private val q15Sql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  concat(p_brand, '#', p_type) AS brand_type,
      |  greatest(p_size, 25) AS size_hi,
      |  least(p_size, 25) AS size_lo,
      |  abs(p_retailprice - 1000.0) AS price_dev,
      |  length(p_name) AS name_len,
      |  upper(p_brand) AS brand_uc,
      |  substring(p_type, 1, 5) AS type_prefix,
      |  p_retailprice * 2.0 - p_size AS arith
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** DISTINCT projection (D1 with all-column keys: dropDuplicates ==
    * SELECT DISTINCT, and deterministic because every output column is a
    * dedup key). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus")
      .dropDuplicates("l_returnflag", "l_linestatus")
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q16Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** MIN/MAX coverage per group — the reference's completeness check
    * (sql/example_queries.sql:164-171) and coverage report
    * (notebooks/gold/03_aggregate_gold.py:108-118). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(
        min($"o_orderdate".cast(DateType)).as("first_date"),
        max($"o_orderdate".cast(DateType)).as("last_date"),
        count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"o_orderstatus")
  }
  private val q17Sql =
    """SELECT o_orderstatus,
      |  min(CAST(o_orderdate AS DATE)) AS first_date,
      |  max(CAST(o_orderdate AS DATE)) AS last_date,
      |  count(*) AS n,
      |  count(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Null-audit aggregation — the reference's bronze null audit
    * (notebooks/bronze/01_ingest_bronze.py:114-118): SUM(CAST(x IS NULL AS
    * INT)). The testdata has no physical nulls, so nulls are introduced via
    * NULLIF to keep the check honest. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(expr("nullif(l_tax, 0.0)").isNull.cast("int")).as("n_zero_tax"),
        sum(expr("nullif(l_discount, 0.0)").isNull.cast("int")).as("n_zero_discount"),
        sum($"l_returnflag".isNull.cast("int")).as("n_null_flag"))
  }
  private val q18Sql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(nullif(l_tax, 0.0) IS NULL AS INT)) AS BIGINT) AS n_zero_tax,
      |  CAST(sum(CAST(nullif(l_discount, 0.0) IS NULL AS INT)) AS BIGINT) AS n_zero_discount,
      |  CAST(sum(CAST(l_returnflag IS NULL AS INT)) AS BIGINT) AS n_null_flag
      |FROM lineitem""".stripMargin

  /** Top-k per group via ranked window + filter — generalization of the
    * reference's latest-per-symbol (W1) to k>1. At scale this avoids a
    * global sort: one shuffle on the group key, per-partition heaps. */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_orderstatus", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderstatus", $"rk")
  }
  private val q19Sql =
    """SELECT o_orderstatus, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_orderstatus, rk""".stripMargin

  /** Pivot (cross-tab) with an explicit value list — explicit values keep
    * the plan static (no extra distinct-collect job) and the output schema
    * deterministic. */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnRenamed("F", "ls_f")
      .withColumnRenamed("O", "ls_o")
      .select($"l_returnflag",
        coalesce($"ls_f", lit(0L)).as("ls_f"),
        coalesce($"ls_o", lit(0L)).as("ls_o"))
      .orderBy($"l_returnflag")
  }
  private val q20Sql =
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_linestatus = 'F') AS ls_f,
      |  count(*) FILTER (WHERE l_linestatus = 'O') AS ls_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sessionization: lag → gap flag → running sum = session id → per-session
    * aggregates. The batch analog of streaming session windows; ts is ns
    * since epoch (Long) on the Spark side, epoch_ns() in DuckDB. */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ts is ns-since-epoch (Long); DuckDB 1.0 truncates parquet ns timestamps
    // to µs, so sessionize in µs on both sides (integer div — a double
    // division would lose precision above 2^53).
    val tsu = expr("ts div 1000")
    val order = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60L * 1000000L
    Tables.events(s, dir)
      .withColumn("tsu", tsu)
      .withColumn("prev_ts", lag($"tsu", 1).over(order))
      .withColumn("new_sess",
        when($"prev_ts".isNull || ($"tsu" - $"prev_ts") > gapUs, lit(1)).otherwise(lit(0)))
      .withColumn("session_seq", sum($"new_sess").over(running))
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min($"event_id").as("first_event"),
        (max($"tsu") - min($"tsu")).as("duration_us"))
      .orderBy($"user_id", $"session_seq")
  }
  private val q21Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
      |l AS (SELECT *, LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
      |      FROM e),
      |f AS (SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
      |        THEN 1 ELSE 0 END AS new_sess FROM l),
      |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |        ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |      FROM f)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(event_id) AS first_event,
      |  max(tsu) - min(tsu) AS duration_us
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q193: NATIVE session windows — Spark's `session_window` grouping
    * expression (the operator Structured Streaming shares), gated against
    * the manual gaps-and-islands construction q21 pins. Semantics under
    * test: an event extends a session iff it lands within the CLOSED gap
    * horizon (t ≤ last + gap — events exactly one gap apart MERGE;
    * SessionTrySpec proves the boundary), so the oracle's break flag is
    * `diff > gap`, the same rule q21 uses — the gate proves the native
    * operator and the manual construction agree step for step. The
    * window's `end` is last event + gap by definition; subtracting the
    * gap back out yields the observed span, keeping the output on the
    * exact µs lattice (no engine-rendered timestamps). Shape: one
    * exchange on user_id, session assembly inside the aggregate — same
    * cost model as q21, no window-function sort pass. */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60L * 1000000L
    Tables.events(s, dir)
      .select($"user_id", timestamp_micros(expr("ts div 1000")).as("tsm"))
      .groupBy($"user_id", session_window($"tsm", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_micros($"sw.start").as("session_start_us"),
        (unix_micros($"sw.end") - unix_micros($"sw.start") - gapUs).as("span_us"),
        $"n_events")
      .orderBy($"user_id", $"session_start_us")
  }
  private val q193Sql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
      |l AS (SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS prev
      |      FROM e),
      |f AS (SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
      |        THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM f)
      |SELECT user_id, min(tsu) AS session_start_us,
      |  max(tsu) - min(tsu) AS span_us,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q15_scalar_functions", q15, Some(q15Sql)),
    QueryDef("q16_distinct", q16, Some(q16Sql)),
    QueryDef("q17_minmax_coverage", q17, Some(q17Sql)),
    QueryDef("q18_null_audit", q18, Some(q18Sql)),
    QueryDef("q19_topk_per_group", q19, Some(q19Sql)),
    QueryDef("q20_pivot", q20, Some(q20Sql)),
    QueryDef("q21_sessionize", q21, Some(q21Sql)),
    QueryDef("q193_session_window", q193, Some(q193Sql)),
    QueryDef("q196_topk_with_ties", q196, Some(q196Sql)),
  )

  /** q196: top-k WITH TIES — rank() ≤ k keeps EVERY row tying with the
    * k-th (ANSI FETCH FIRST … WITH TIES semantics), where q19's
    * row_number() ≤ k form would cut ties arbitrarily; ranking on a
    * coarse measure (per-quantity line counts) makes real ties routine,
    * so the gate exercises the difference, and the output SET is
    * deterministic because tied rows are tied on the actual measure —
    * no tie-break needed for membership, only for display order. Shape:
    * grouped count, then a per-flag rank over ≤50 rows — the window
    * runs on the post-aggregate cells. */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_returnflag").orderBy($"n".desc)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_quantity".cast("long").as("qty"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", rank().over(w).cast("long"))
      .filter($"rk" <= 3L)
      .select($"l_returnflag", $"qty", $"n", $"rk")
      .orderBy($"l_returnflag", $"rk", $"qty")
  }
  private val q196Sql =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT *, CAST(rank() OVER (PARTITION BY l_returnflag
      |    ORDER BY n DESC) AS BIGINT) AS rk FROM c)
      |SELECT l_returnflag, qty, n, rk FROM r WHERE rk <= 3
      |ORDER BY l_returnflag, rk, qty""".stripMargin
}
