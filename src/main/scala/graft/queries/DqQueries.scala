package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The reference's data-quality check suite (SURVEY §2.12,
  * notebooks/gold/04_data_quality_checks.py) re-expressed over the testdata,
  * plus the remaining scalar/date surface: to_date, datediff, date parts,
  * JSON extraction, and D1's arbitrary-survivor dedup.
  *
  * Reference semantics preserved exactly:
  *  - gap/stale checks compute a PASS/FAIL status but persist FAIL rows only
  *    (04:68-73,118-123);
  *  - the jump check hardcodes 'FAIL' (04:85);
  *  - human-readable `details` strings are built with concat over casts
  *    (04:71,88,121,138-142);
  *  - the run summary packs scalar-subquery counts into one row (04:127-143).
  * The staleness anchor is a fixed date rather than current_date() so the
  * oracle compare is reproducible (the reference's current_date() is a
  * deterministic-run hazard it papers over by running daily).
  */
object DqQueries extends QueryModule {

  /** q32: missing-activity gap detection — LAG(date) per key, DATEDIFF,
    * threshold CASE, emit only failures (reference 04:43-74). One window
    * shuffle on the key; the filter prunes pre-write. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"od", $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("od", $"o_orderdate".cast(DateType))
      .withColumn("prev_od", lag($"od", 1).over(w))
      .withColumn("gap_days", datediff($"od", $"prev_od"))
      .filter($"gap_days" > 365)
      .select(
        $"o_custkey", $"od".as("gap_end"), $"prev_od".as("gap_start"), $"gap_days",
        lit("FAIL").as("check_status"),
        concat(lit("gap of "), $"gap_days".cast(StringType),
          lit(" days before "), $"od".cast(StringType)).as("details"))
      .orderBy($"o_custkey", $"gap_end")
  }
  private val q32Sql =
    """WITH d AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders),
      |l AS (SELECT o_custkey, od,
      |    LAG(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS prev_od
      |  FROM d),
      |g AS (SELECT *, date_diff('day', prev_od, od) AS gap_days FROM l)
      |SELECT o_custkey, od AS gap_end, prev_od AS gap_start, gap_days,
      |  'FAIL' AS check_status,
      |  concat('gap of ', CAST(gap_days AS VARCHAR), ' days before ',
      |         CAST(od AS VARCHAR)) AS details
      |FROM g WHERE gap_days > 365
      |ORDER BY o_custkey, gap_end""".stripMargin

  /** q33: stale-data check — per-key MAX(date), days since a fixed anchor,
    * persist failures only (reference 04:95-124). */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val anchor = lit(java.sql.Date.valueOf("1998-08-02"))
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate".cast(DateType)).as("last_od"))
      .withColumn("days_stale", datediff(anchor, $"last_od"))
      .filter($"days_stale" > 365)
      .select($"o_custkey", $"last_od", $"days_stale",
        lit("FAIL").as("check_status"),
        concat(lit("no orders for "), $"days_stale".cast(StringType),
          lit(" days (last "), $"last_od".cast(StringType), lit(")")).as("details"))
      .orderBy($"o_custkey")
  }
  private val q33Sql =
    """WITH m AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_od
      |  FROM orders GROUP BY 1),
      |st AS (SELECT *, date_diff('day', last_od, DATE '1998-08-02') AS days_stale FROM m)
      |SELECT o_custkey, last_od, days_stale, 'FAIL' AS check_status,
      |  concat('no orders for ', CAST(days_stale AS VARCHAR), ' days (last ',
      |         CAST(last_od AS VARCHAR), ')') AS details
      |FROM st WHERE days_stale > 365
      |ORDER BY o_custkey""".stripMargin

  /** q34: sudden-jump check — LAG per key, relative change beyond threshold,
    * status hardcoded FAIL (reference 04:77-92). value_change math is
    * per-row double arithmetic: bit-deterministic. */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("rel_change", abs($"value" / nullif($"prev_value", lit(0.0)) - lit(1.0)))
      .filter($"rel_change" > 50.0)
      .select($"user_id", $"event_id", $"value", $"prev_value",
        round($"rel_change", 6).as("rel_change"),
        lit("FAIL").as("check_status"))
      .orderBy($"user_id", $"event_id")
  }
  private val q34Sql =
    """WITH l AS (SELECT user_id, event_id, value,
      |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |  FROM events),
      |c AS (SELECT *, abs(value / nullif(prev_value, 0.0) - 1.0) AS rel_change FROM l)
      |SELECT user_id, event_id, value, prev_value,
      |  round(rel_change, 6) AS rel_change, 'FAIL' AS check_status
      |FROM c WHERE rel_change > 50.0
      |ORDER BY user_id, event_id""".stripMargin

  /** q35: pipeline row-count summary — scalar-subquery counts concatenated
    * into a single human-readable row (reference 04:127-143). */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem", "customer", "events")
      .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT 'row_counts' AS check_name, 'PASS' AS check_status,
        |  concat('orders=', CAST((SELECT count(*) FROM orders) AS STRING),
        |         ' lineitem=', CAST((SELECT count(*) FROM lineitem) AS STRING),
        |         ' customer=', CAST((SELECT count(*) FROM customer) AS STRING),
        |         ' events=', CAST((SELECT count(*) FROM events) AS STRING)) AS details""".stripMargin)
  }
  private val q35Sql =
    """SELECT 'row_counts' AS check_name, 'PASS' AS check_status,
      |  concat('orders=', CAST((SELECT count(*) FROM orders) AS VARCHAR),
      |         ' lineitem=', CAST((SELECT count(*) FROM lineitem) AS VARCHAR),
      |         ' customer=', CAST((SELECT count(*) FROM customer) AS VARCHAR),
      |         ' events=', CAST((SELECT count(*) FROM events) AS VARCHAR)) AS details""".stripMargin

  /** q36: JSON field extraction from the semi-structured `props` column —
    * get_json_object pushdown into a grouped aggregate. */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }
  private val q36Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q37: date-part surface — to_date, year/month/day, quarter, date_add,
    * date truncation; grouped to keep output compact. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("od", $"o_orderdate".cast(DateType))
      .groupBy(
        year($"od").as("yr"),
        quarter($"od").as("qtr"))
      .agg(
        count(lit(1)).as("n"),
        min(month($"od")).as("min_month"),
        max(dayofmonth($"od")).as("max_dom"),
        min(date_add($"od", 30)).as("min_plus30"),
        max(trunc($"od", "month")).as("max_month_start"))
      .orderBy($"yr", $"qtr")
  }
  private val q37Sql =
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders)
      |SELECT year(od) AS yr, quarter(od) AS qtr, count(*) AS n,
      |  min(month(od)) AS min_month,
      |  max(day(od)) AS max_dom,
      |  min(od + INTERVAL 30 DAY)::DATE AS min_plus30,
      |  max(date_trunc('month', od))::DATE AS max_month_start
      |FROM d GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  /** q38: D1 arbitrary-survivor dedup — dropDuplicates on a key subset.
    * The survivor's non-key columns are nondeterministic by contract, so
    * the checked output is survivor-independent: key count and key sum. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .dropDuplicates("l_orderkey")
      .agg(count(lit(1)).as("n_keys"), sum($"l_orderkey").as("sum_keys"))
  }
  private val q38Sql =
    """SELECT count(*) AS n_keys, CAST(sum(l_orderkey) AS BIGINT) AS sum_keys
      |FROM (SELECT DISTINCT l_orderkey FROM lineitem) t""".stripMargin

  /** q129: referential-integrity audit across the star schema's FK edges —
    * each edge is one LEFT ANTI join (child keys with no parent) reduced to
    * a count, union-stacked into the familiar DQ report shape. Dimension
    * sides (orders keys excepted) are small enough to broadcast; the
    * orders probe stays a shuffled anti join — exactly the two shapes this
    * audit would use per edge at warehouse scale. Counting DISTINCT
    * missing parents (not orphan child rows) keeps each edge's output a
    * bounded diagnostic rather than a second fact table. */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    def edge(name: String, child: DataFrame, key: String,
             parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
      val par = if (bcast) broadcast(parent.select(col(pkey))) else parent.select(col(pkey))
      child.select(col(key)).distinct()
        .join(par, col(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("n_orphan_keys"))
        .select(lit(name).as("fk_edge"), $"n_orphan_keys")
    }
    edge("lineitem->orders", li, "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", bcast = false)
      .unionByName(edge("lineitem->part", li, "l_partkey",
        Tables.part(s, dir), "p_partkey", bcast = true))
      .unionByName(edge("lineitem->supplier", li, "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey", bcast = true))
      .unionByName(edge("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey", bcast = true))
      .unionByName(edge("customer->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey", bcast = true))
      .orderBy($"fk_edge")
  }
  private val q129Sql =
    """SELECT 'lineitem->orders' AS fk_edge, CAST(count(*) AS BIGINT) AS n_orphan_keys
      |  FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = c.l_orderkey)
      |UNION ALL
      |SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
      |  FROM (SELECT DISTINCT l_partkey FROM lineitem) c
      |  WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey)
      |UNION ALL
      |SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
      |  FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
      |  WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = c.l_suppkey)
      |UNION ALL
      |SELECT 'orders->customer', CAST(count(*) AS BIGINT)
      |  FROM (SELECT DISTINCT o_custkey FROM orders) c
      |  WHERE NOT EXISTS (SELECT 1 FROM customer cu WHERE cu.c_custkey = c.o_custkey)
      |UNION ALL
      |SELECT 'customer->nation', CAST(count(*) AS BIGINT)
      |  FROM (SELECT DISTINCT c_nationkey FROM customer) c
      |  WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
      |ORDER BY fk_edge""".stripMargin

  /** q189: CUSUM drift alarm — the sequential control chart over daily
    * revenue per event type, the change-point monitor a DQ layer runs on
    * every metric stream. The one-sided CUSUM recurrence
    * S_t = max(0, S_{t-1} + (x_t − μ)) is the SAME clamped fold as q183,
    * so it gets the same reflection identity (prefix sum minus its
    * running minimum) — two windows over one exchange, no sequential
    * scan. Exactness: deviations are pre-scaled by the day count
    * (v_t = n·x_t − T with n, T, x LONG), which makes the mean exact
    * without division, and the alarm test 2·S > n·T·…, here 2·S > T,
    * stays all-integer; the only doubles are the final reported ratios.
    * The daily cells are |types|×|days| — tiny after the first grouped
    * pass at any corpus size, which is what makes the per-type windows
    * safe. */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, dir)
      .groupBy($"event_type", expr("ts div 86400000000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("x"))
    val wType = Window.partitionBy($"event_type")
    val wRun = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("n", count(lit(1)).over(wType))
      .withColumn("t", sum($"x").over(wType))
      .withColumn("s", sum($"n" * $"x" - $"t").over(wRun))
      .withColumn("cusum", $"s" - least(min($"s").over(wRun), lit(0L)))
      .groupBy($"event_type")
      .agg(
        sum(when(lit(2L) * $"cusum" > $"t", 1L).otherwise(0L)).as("n_alarm_days"),
        min(when(lit(2L) * $"cusum" > $"t", $"day")).as("first_alarm_day"),
        round(max($"cusum").cast("double") / max($"t"), 6).as("peak_ratio"))
      .orderBy($"event_type")
  }
  private val q189Sql =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS t FROM d GROUP BY 1),
      |p AS (
      |  SELECT d.event_type, day, m.t, sum(m.n * d.x - m.t) OVER w AS s
      |  FROM d JOIN m USING (event_type)
      |  WINDOW w AS (PARTITION BY d.event_type ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |c AS (
      |  SELECT event_type, day, t, s - least(min(s) OVER w, 0) AS cusum
      |  FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type,
      |  CAST(sum(CASE WHEN 2 * cusum > t THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_alarm_days,
      |  min(CASE WHEN 2 * cusum > t THEN day END) AS first_alarm_day,
      |  round(CAST(max(cusum) AS DOUBLE) / max(t), 6) AS peak_ratio
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** q181: DQ triage — the reference's use-case-4 question verbatim ("did
    * anything fail in the latest pipeline run?", docs/use_cases.md:44-57):
    * a multi-run data_quality_checks relation (three simulated run dates,
    * each re-running the gap/stale checks over the data as of that run,
    * plus the PASS row-count summary), then the triage SELECT — latest
    * run via scalar subquery, FAIL rows only, ordered by layer, check,
    * key. The checks relation is built with one broadcast of the 3-row
    * runs dim (never a data-sized cross join) and one window/agg pair per
    * family; the triage filter is a broadcast semi-join on the 1-row max. */
  private def q181(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val runs = Seq("1998-08-01", "1998-08-02", "1998-08-03").toDF("rd")
      .select($"rd".cast(DateType).as("run_dt"))
    val d = Tables.orders(s, dir).select($"o_custkey", $"o_orderkey",
      $"o_orderdate".cast(DateType).as("od"))
    val scoped = d.crossJoin(broadcast(runs)).filter($"od" <= $"run_dt")
    val w = Window.partitionBy($"run_dt", $"o_custkey").orderBy($"od", $"o_orderkey")
    val gaps = scoped
      .withColumn("prev_od", lag($"od", 1).over(w))
      .withColumn("gap_days", datediff($"od", $"prev_od"))
      .filter($"gap_days" > 365)
      .select($"run_dt", lit("silver").as("layer"),
        lit("missing_activity").as("check_name"),
        $"o_custkey".cast(StringType).as("symbol"),
        lit("FAIL").as("check_status"),
        $"gap_days".cast(DoubleType).as("metric_value"),
        concat(lit("gap of "), $"gap_days".cast(StringType),
          lit(" days ending "), $"od".cast(StringType)).as("details"))
    val stale = scoped.groupBy($"run_dt", $"o_custkey")
      .agg(max($"od").as("last_od"))
      .withColumn("days_stale", datediff($"run_dt", $"last_od"))
      .filter($"days_stale" > 365)
      .select($"run_dt", lit("silver").as("layer"),
        lit("stale_data").as("check_name"),
        $"o_custkey".cast(StringType).as("symbol"),
        lit("FAIL").as("check_status"),
        $"days_stale".cast(DoubleType).as("metric_value"),
        concat(lit("no activity for "), $"days_stale".cast(StringType),
          lit(" days (last "), $"last_od".cast(StringType), lit(")")).as("details"))
    val counts = scoped.groupBy($"run_dt").agg(count(lit(1)).as("n"))
      .select($"run_dt", lit("pipeline").as("layer"),
        lit("row_counts").as("check_name"),
        lit(null).cast(StringType).as("symbol"),
        lit("PASS").as("check_status"),
        $"n".cast(DoubleType).as("metric_value"),
        concat(lit("orders="), $"n".cast(StringType)).as("details"))
    val checks = gaps.unionByName(stale).unionByName(counts)
    val latest = checks.agg(max($"run_dt").as("mx"))
    checks.join(broadcast(latest), $"run_dt" === $"mx")
      .filter($"check_status" === "FAIL")
      .select($"run_dt", $"layer", $"check_name", $"symbol",
        $"check_status", $"metric_value", $"details")
      .orderBy($"layer", $"check_name", $"symbol")
  }
  private val q181Sql =
    """WITH runs(run_dt) AS (VALUES (DATE '1998-08-01'),
      |    (DATE '1998-08-02'), (DATE '1998-08-03')),
      |d AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
      |  FROM orders),
      |scoped AS (SELECT r.run_dt, d.o_custkey, d.o_orderkey, d.od
      |  FROM d CROSS JOIN runs r WHERE d.od <= r.run_dt),
      |l AS (SELECT run_dt, o_custkey, od, LAG(od) OVER (
      |    PARTITION BY run_dt, o_custkey ORDER BY od, o_orderkey) AS prev_od
      |  FROM scoped),
      |gaps AS (SELECT run_dt, 'silver' AS layer,
      |    'missing_activity' AS check_name,
      |    CAST(o_custkey AS VARCHAR) AS symbol, 'FAIL' AS check_status,
      |    CAST(date_diff('day', prev_od, od) AS DOUBLE) AS metric_value,
      |    concat('gap of ', CAST(date_diff('day', prev_od, od) AS VARCHAR),
      |      ' days ending ', CAST(od AS VARCHAR)) AS details
      |  FROM l WHERE date_diff('day', prev_od, od) > 365),
      |m AS (SELECT run_dt, o_custkey, max(od) AS last_od
      |  FROM scoped GROUP BY 1, 2),
      |stale AS (SELECT run_dt, 'silver' AS layer, 'stale_data' AS check_name,
      |    CAST(o_custkey AS VARCHAR) AS symbol, 'FAIL' AS check_status,
      |    CAST(date_diff('day', last_od, run_dt) AS DOUBLE) AS metric_value,
      |    concat('no activity for ',
      |      CAST(date_diff('day', last_od, run_dt) AS VARCHAR),
      |      ' days (last ', CAST(last_od AS VARCHAR), ')') AS details
      |  FROM m WHERE date_diff('day', last_od, run_dt) > 365),
      |counts AS (SELECT run_dt, 'pipeline' AS layer,
      |    'row_counts' AS check_name, CAST(NULL AS VARCHAR) AS symbol,
      |    'PASS' AS check_status, CAST(count(*) AS DOUBLE) AS metric_value,
      |    concat('orders=', CAST(count(*) AS VARCHAR)) AS details
      |  FROM scoped GROUP BY run_dt),
      |checks AS (SELECT * FROM gaps UNION ALL SELECT * FROM stale
      |  UNION ALL SELECT * FROM counts)
      |SELECT run_dt, layer, check_name, symbol, check_status,
      |  metric_value, details
      |FROM checks
      |WHERE run_dt = (SELECT max(run_dt) FROM checks)
      |  AND check_status = 'FAIL'
      |ORDER BY layer, check_name, symbol""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q32_gap_detection", q32, Some(q32Sql)),
    QueryDef("q181_dq_triage", q181, Some(q181Sql)),
    QueryDef("q33_stale_check", q33, Some(q33Sql)),
    QueryDef("q34_jump_check", q34, Some(q34Sql)),
    QueryDef("q35_pipeline_counts", q35, Some(q35Sql)),
    QueryDef("q36_json_extract", q36, Some(q36Sql)),
    QueryDef("q37_date_parts", q37, Some(q37Sql)),
    QueryDef("q38_dropdup_arbitrary", q38, Some(q38Sql)),
    QueryDef("q129_fk_audit", q129, Some(q129Sql)),
    QueryDef("q189_cusum_alarm", q189, Some(q189Sql)),
  )
}
