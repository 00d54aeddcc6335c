package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling / cleaning surface a curation pipeline runs before
  * training: linear-regression aggregates (drift/trend fitting),
  * width_bucket histograms with explicit under/overflow buckets, safe
  * parsing of mixed-validity strings (TRY_CAST), and PII masking.
  *
  * All four are single-scan, partial-aggregable shapes: at 100 TB each is
  * one map-side pass plus a tiny (grouped or sliced) exchange — nothing
  * here materializes per-row state on the driver.
  */
object ProfilingQueries extends QueryModule {

  /** q166: regression-aggregate family — fit price ~ quantity per return
    * flag in ONE grouped pass (regr_* are moment sketches: each is a
    * partial-aggregable combination of Σx, Σy, Σxy, Σx², n, so the 100 TB
    * plan is a map-side partial agg + 3-row final agg, no second scan).
    * Moments are rounded coarsely enough (6 dp on O(1e2) slopes, 4 dp on
    * O(1e4) intercepts) that double accumulation-order differences cannot
    * flip the compare — same policy as q52, verified across SFs. */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        regr_count($"l_extendedprice", $"l_quantity").as("n_pairs"),
        round(regr_slope($"l_extendedprice", $"l_quantity"), 6).as("slope"),
        round(regr_intercept($"l_extendedprice", $"l_quantity"), 4).as("intercept"),
        round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
        round(regr_avgx($"l_extendedprice", $"l_quantity"), 6).as("avg_qty"),
        round(regr_avgy($"l_extendedprice", $"l_quantity"), 4).as("avg_price"))
      .orderBy($"l_returnflag")
  }
  private val q166Sql =
    """SELECT l_returnflag,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty,
      |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q167: width_bucket histogram of order totals INCLUDING the under /
    * overflow buckets (0 and n+1) that q98's in-range floor binning never
    * produces. Bucket edges end in .005 so no 2-dp money value can sit on
    * a boundary: the nearest computed ratio is ≥ 2.5e-7 from an integer,
    * far outside double-rounding reach, which keeps Spark's
    * (v-min)/(max-min)*n evaluation and the oracle's floor((v-min)/w)
    * arithmetic on the same side of every floor. */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(width_bucket($"o_totalprice", lit(50000.005), lit(450000.005), lit(20)).as("bucket"),
        $"o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        round(min($"o_totalprice"), 2).as("lo"),
        round(max($"o_totalprice"), 2).as("hi"))
      .orderBy($"bucket")
  }
  private val q167Sql =
    """SELECT CASE WHEN o_totalprice < 50000.005 THEN 0
      |            WHEN o_totalprice >= 450000.005 THEN 21
      |            ELSE CAST(FLOOR((o_totalprice - 50000.005) / 20000.0) AS BIGINT) + 1
      |       END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q168: safe parsing of a mixed-validity string column — the
    * ingest-time shape where a field is numeric for some rows and free
    * text for others. TRY_CAST yields NULL (never an exception or a
    * poisoned partition) on the text rows; the audit counts parsed vs
    * rejected and checks the parsed sum, per nation. The validity mix is
    * derived deterministically from the key so every SF exercises both
    * branches. */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("raw",
        when($"c_custkey" % 2 === 0, $"c_custkey".cast("string"))
          .otherwise($"c_name"))
      .withColumn("parsed", expr("TRY_CAST(raw AS BIGINT)"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        count($"parsed").as("n_parsed"),
        (count(lit(1)) - count($"parsed")).as("n_rejected"),
        sum($"parsed").as("parsed_sum"))
      .orderBy($"c_nationkey")
  }
  private val q168Sql =
    """SELECT c_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(parsed) AS BIGINT) AS n_parsed,
      |  CAST(count(*) - count(parsed) AS BIGINT) AS n_rejected,
      |  CAST(sum(parsed) AS BIGINT) AS parsed_sum
      |FROM (
      |  SELECT c_nationkey,
      |    TRY_CAST(CASE WHEN c_custkey % 2 = 0
      |             THEN CAST(c_custkey AS VARCHAR) ELSE c_name END AS BIGINT) AS parsed
      |  FROM customer) t
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** q169: PII masking — the pre-training scrub pass. Digit runs in the
    * id-bearing name field are masked to '#' per character
    * (format-preserving: the text around them survives, so downstream
    * parsers keep working), checked row-level on a deterministic 1-in-97
    * key slice plus a per-row count of masked characters. regexp_replace
    * replaces ALL matches on the Spark side; DuckDB needs the explicit
    * 'g' flag — pinned here. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_custkey" % 97 === 0)
      .select($"c_custkey",
        regexp_replace($"c_name", "[0-9]", "#").as("name_masked"),
        (length($"c_name") - length(regexp_replace($"c_name", "[0-9]", "")))
          .cast("long").as("n_masked"))
      .orderBy($"c_custkey")
  }
  private val q169Sql =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_masked
      |FROM customer WHERE c_custkey % 97 = 0 ORDER BY c_custkey""".stripMargin

  /** q170: calendar-function family — quarter bucketing, month-end
    * (last_day), and weekday classification. Day-of-week numbering is the
    * classic cross-engine trap: Spark's weekday() is 0=Monday while
    * DuckDB's dow() is 0=Sunday, so both sides are pinned to ISO
    * numbering (1=Monday..7=Sunday: Spark weekday+1, DuckDB isodow).
    * date_trunc returns TIMESTAMP in Spark but DATE in DuckDB — cast. */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(to_date($"o_orderdate").as("od"), $"o_totalprice")
      .select(date_trunc("quarter", $"od").cast("date").as("qtr"),
        (weekday($"od") + 1).as("isodow"), $"od", $"o_totalprice")
      .groupBy($"qtr")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"isodow" >= 6, 1L).otherwise(0L)).as("n_weekend"),
        max(last_day($"od")).as("last_month_end"),
        round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double"), 2)
          .as("qtr_revenue"))
      .orderBy($"qtr")
  }
  private val q170Sql =
    """SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN isodow(CAST(o_orderdate AS DATE)) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
      |  max(last_day(CAST(o_orderdate AS DATE))) AS last_month_end,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS qtr_revenue
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q171: equi-DEPTH histogram — ntile deciles over order totals, each
    * holding ~n/10 rows with its value range. The complement of q167's
    * equi-width buckets: this is the profile that stays informative under
    * heavy skew (every bucket has mass). The sort carries a unique
    * tie-break key so decile assignment at equal prices is deterministic
    * on both engines. The ntile FUNCTION's exact semantics (the first
    * n mod k groups take ceil(n/k) rows, the rest floor(n/k)) are
    * reproduced ARITHMETICALLY from the global rank — assigned by
    * [[graft.operators.DistributedScan.rowNumbers]]'s two-level scan, so
    * no single-partition data-sized window appears (the oracle runs the
    * literal `ntile(10) OVER`, cross-checking the formula); q108 computes
    * the same decile statistic from percentile cut points with no total
    * order at all — the declared 100 TB path when even a ranged scan is
    * too much. */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranked = graft.operators.DistributedScan.rowNumbers(
      Tables.orders(s, dir).select($"o_orderkey", $"o_totalprice"),
      Seq($"o_totalprice", $"o_orderkey"), "r")
    val n = ranked.agg(count(lit(1)).as("n"))
    // ntile(k): rank r lands in the first (n mod k) size-(q+1) groups or
    // the remaining size-q ones; all-integer expressions (div, not /)
    ranked.crossJoin(broadcast(n))
      .withColumn("decile",
        expr("""CASE WHEN r <= (n % 10) * (n div 10 + 1)
               |  THEN (r - 1) div (n div 10 + 1) + 1
               |  ELSE (n % 10) + (r - (n % 10) * (n div 10 + 1) - 1)
               |    div greatest(n div 10, 1) + 1 END""".stripMargin)
          .cast("int"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_orders"),
        round(min($"o_totalprice"), 2).as("lo"),
        round(max($"o_totalprice"), 2).as("hi"))
      .orderBy($"decile")
  }
  private val q171Sql =
    """SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM (SELECT o_totalprice,
      |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |      FROM orders) t
      |GROUP BY decile ORDER BY decile""".stripMargin

  /** q172: DISTINCT aggregate over a window partition. Spark's window
    * operator rejects DISTINCT outright, so the engine technique is the
    * dense_rank rewrite — dense_rank() at the partition's sort order
    * peaks at the distinct count, broadcast back with a second frame —
    * while DuckDB runs the literal count(DISTINCT ...) OVER (...). Two
    * window passes over the SAME partitioning (one exchange, one sort;
    * the second window reuses the first's distribution), checked row-level
    * on a key slice. */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byCust = org.apache.spark.sql.expressions.Window.partitionBy($"o_custkey")
    val ranked = byCust.orderBy($"o_orderpriority")
    Tables.orders(s, dir)
      .filter($"o_custkey" % 199 === 0)
      .select($"o_orderkey", $"o_custkey",
        dense_rank().over(ranked).as("dr"))
      .select($"o_orderkey", $"o_custkey",
        max($"dr").over(byCust).cast("long").as("n_distinct_prio"))
      .orderBy($"o_orderkey")
  }
  private val q172Sql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_distinct_prio
      |FROM orders WHERE o_custkey % 199 = 0 ORDER BY o_orderkey""".stripMargin

  /** q195: TRY arithmetic — q168's safe-parsing discipline extended to
    * computation: `try_divide` / `try_multiply` return NULL instead of
    * faulting where ANSI arithmetic would raise (zero divisor, BIGINT
    * overflow). The gate constructs BOTH failure modes from real data —
    * 1/(qty−50) divides by zero exactly at qty=50, and partkey·2^61
    * overflows 64 bits exactly when partkey ≥ 4 — and audits NULL counts
    * per group, so a regression in either the error detection or the
    * NULL path moves a count. DuckDB has no TRY forms; the oracle guards
    * each expression with the equivalent CASE, which also documents the
    * exact failure predicate being tested. The max over the successful
    * divisions pins the value path (max is order-free).
    *
    * Scale note the first bench run taught: TryEval's failure path is a
    * thrown-and-caught exception PER ROW, so a try_* column that fails on
    * most rows costs ~20 µs/row — 13.7 s of the original all-rows
    * overflow probe at sf0.1 was exception handling, not arithmetic. The
    * overflow probe therefore runs on a keyed 1% slice (pmod of the key,
    * deterministic at any SF): the semantics pin is unchanged, the cost
    * is bounded, and the lesson stands in this comment — TRY forms are
    * for data where failure is the EXCEPTION; a mostly-failing TRY column
    * is an anti-pattern at any scale. */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("try_divide(1.0, l_quantity - 50)").isNull.cast("long"))
          .as("n_div_null"),
        sum(when(pmod($"l_partkey", lit(100L)) === 0L,
          expr("try_multiply(l_partkey, CAST(2305843009213693952 AS BIGINT))")
            .isNull.cast("long")).otherwise(0L)).as("n_mul_overflow"),
        max(round(expr("try_divide(1.0, l_quantity - 50)"), 9))
          .as("max_inv_gap"))
      .orderBy($"l_returnflag")
  }
  private val q195Sql =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN l_quantity = 50 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_div_null,
      |  CAST(sum(CASE WHEN l_partkey % 100 = 0 AND l_partkey >= 4
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_mul_overflow,
      |  max(CASE WHEN l_quantity <> 50
      |      THEN round(1.0 / (l_quantity - 50), 9) END) AS max_inv_gap
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q288: differentially-private count release (Laplace mechanism,
    * ε = 0.1, sensitivity 1 → scale b = 10) — the governance layer next
    * to q169's PII masking: per-event-type counts with calibrated noise
    * from the inverse Laplace CDF. "Random" draws are the q238 seeded
    * LCG keyed by each type's alphabetical rank, so the release is
    * bit-reproducible and the DuckDB oracle replays the mechanism
    * exactly (a real deployment rotates the seed and withholds n_true;
    * this gate audits the MECHANISM — noise magnitude and the ±b·ln(2u)
    * branch structure — not a production release). u maps to (0,1) as
    * (u+0.5)/2³¹ so ln never sees 0; outputs round at 4 dp after the one
    * float expression, written textually identically in both engines. */
  private def q288(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n_true"))
    val seeded = counts
      .withColumn("k", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"event_type")).cast("long"))
      .withColumn("u", (lit(1103515245L) *
        (($"k" * 2654435761L) % 2147483648L) + 12345L) % 2147483648L)
      .withColumn("u01", ($"u" + 0.5) / 2147483648.0)
    seeded.withColumn("noise",
        when($"u01" < 0.5, lit(10.0) * log(lit(2.0) * $"u01"))
          .otherwise(lit(-10.0) * log(lit(2.0) * (lit(1.0) - $"u01"))))
      .select($"event_type", $"n_true",
        round($"n_true" + $"noise", 4).as("released4"))
      .orderBy($"event_type")
  }
  private val q288Sql =
    """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
      |  FROM events GROUP BY 1),
      |k AS (SELECT event_type, n_true,
      |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS k
      |  FROM c),
      |u AS (SELECT event_type, n_true,
      |    (1103515245 * ((k * 2654435761) % 2147483648) + 12345)
      |      % 2147483648 AS u
      |  FROM k),
      |n AS (SELECT event_type, n_true, (u + 0.5) / 2147483648.0 AS u01 FROM u)
      |SELECT event_type, n_true,
      |  round(n_true + CASE WHEN u01 < 0.5 THEN 10.0 * ln(2.0 * u01)
      |    ELSE -10.0 * ln(2.0 * (1.0 - u01)) END, 4) AS released4
      |FROM n ORDER BY event_type""".stripMargin

  /** q320: K-ANONYMITY audit — the release-readiness check a dataset
    * must pass before quasi-identifiers ship (q288's DP release protects
    * AGGREGATES; this audits the MICRODATA: a row whose quasi-identifier
    * combination matches fewer than k individuals is re-identifiable).
    * QI = (nation, market segment, account-balance decile — the decile
    * via exact integer arithmetic over the known [-1000, 10000) balance
    * range, cents-scaled so both engines bin identically); k = 5. Per
    * nation: equivalence-class count, violating-class count, rows that
    * would need suppression, and the suppression rate in exact half-up
    * ppm — the shape of the generalize-vs-suppress decision loop.
    *
    * Scale shape: one grouped count on the QI key, one grouped rollup to
    * nation — both partial-aggregable single shuffles; no row-level
    * output (the audit is the artifact, not the microdata). */
  private def q320(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 5L
    val qi = Tables.customer(s, dir)
      .select($"c_nationkey".cast("long").as("nation"), $"c_mktsegment",
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 110000")
          .as("bal_decile"))
    qi.groupBy($"nation", $"c_mktsegment", $"bal_decile")
      .agg(count(lit(1)).as("cls_n"))
      .groupBy($"nation")
      .agg(count(lit(1)).as("n_classes"),
        sum(when($"cls_n" < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when($"cls_n" < k, $"cls_n").otherwise(0L)).as("suppressed_rows"),
        sum($"cls_n").as("n_rows"))
      .select($"nation", $"n_classes", $"n_violating", $"suppressed_rows",
        $"n_rows",
        expr("(2000000 * suppressed_rows + n_rows) div (2 * n_rows)")
          .as("suppression_ppm"))
      .orderBy($"nation")
  }
  private val q320Sql =
    """WITH qi AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    c_mktsegment,
      |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 110000
      |      AS bal_decile
      |  FROM customer),
      |cls AS (SELECT nation, c_mktsegment, bal_decile,
      |    CAST(count(*) AS BIGINT) AS cls_n
      |  FROM qi GROUP BY 1, 2, 3)
      |SELECT nation, CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(CASE WHEN cls_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating,
      |  CAST(sum(CASE WHEN cls_n < 5 THEN cls_n ELSE 0 END) AS BIGINT)
      |    AS suppressed_rows,
      |  CAST(sum(cls_n) AS BIGINT) AS n_rows,
      |  (2000000 * CAST(sum(CASE WHEN cls_n < 5 THEN cls_n ELSE 0 END)
      |      AS BIGINT) + CAST(sum(cls_n) AS BIGINT))
      |    // (2 * CAST(sum(cls_n) AS BIGINT)) AS suppression_ppm
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q320_k_anonymity", q320, Some(q320Sql)),
    QueryDef("q288_dp_release", q288, Some(q288Sql)),
    QueryDef("q166_regr_family", q166, Some(q166Sql)),
    QueryDef("q167_width_bucket", q167, Some(q167Sql)),
    QueryDef("q168_try_cast", q168, Some(q168Sql)),
    QueryDef("q169_pii_mask", q169, Some(q169Sql)),
    QueryDef("q170_calendar_functions", q170, Some(q170Sql)),
    QueryDef("q171_ntile_deciles", q171, Some(q171Sql)),
    QueryDef("q172_window_distinct", q172, Some(q172Sql)),
    QueryDef("q195_try_arithmetic", q195, Some(q195Sql)),
    QueryDef("q199_log2_histogram", q199, Some(q199Sql)),
  )

  /** q199: exponential (power-of-2) histogram — the log-scale bucketing
    * every latency/metrics system uses, computed WITHOUT libm:
    * floor(log2(x)) for a positive integer is its binary-string length
    * minus one, an exact integer identity on both engines (Spark `bin`,
    * DuckDB `format('{:b}')`), where a double log2 would be correctly
    * rounded only by luck at bucket boundaries (the q160 libm-free
    * discipline). Bucket bounds are reconstructed by bit shifts — also
    * exact. One grouped pass; |types|×64 output cells max at any corpus
    * size. */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("cents"))
      .filter($"cents" > 0L)
      .withColumn("bucket", (length(expr("bin(cents)")) - 1).cast("long"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"))
      .withColumn("hi", expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) + 1) - 1"))
      .select($"event_type", $"bucket", $"lo", $"hi", $"n")
      .orderBy($"event_type", $"bucket")
  }
  private val q199Sql =
    """WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |b AS (
      |  SELECT event_type,
      |    CAST(length(format('{:b}', cents)) - 1 AS BIGINT) AS bucket
      |  FROM c WHERE cents > 0)
      |SELECT event_type, bucket,
      |  (CAST(1 AS BIGINT) << CAST(bucket AS INT)) AS lo,
      |  (CAST(1 AS BIGINT) << (CAST(bucket AS INT) + 1)) - 1 AS hi,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
