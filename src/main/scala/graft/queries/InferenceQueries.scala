package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.DistributedScan
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-inference surface: two-sample hypothesis tests and
  * correlation/regression estimators, the EDA layer a curation pipeline
  * runs before/after an intervention (did the filter change the value
  * distribution? are these columns monotonically related?).
  *
  * Cross-engine exactness strategy, same as q89/q111: every aggregate that
  * crosses rows is an exact LONG or DECIMAL sum (order-independent under
  * any partitioning), and doubles appear only in the final per-row formula
  * — identical expression shape in Spark and DuckDB, then round(…, 6).
  * CDF-style cumulatives go through [[DistributedScan.prefixSums]] — never
  * a single-partition global window.
  *
  * Reference behavior: the reference's analyst layer stops at descriptive
  * stats (`sql/example_queries.sql`); these extend the same tables to the
  * inferential statistics its dashboards imply (distribution drift between
  * event types, price/quantity association strength).
  */
object InferenceQueries extends QueryModule {

  /** Per-distinct-value counts of the two compared samples — the shared
    * contingency spine of the KS and Mann-Whitney tests. One shuffle
    * (groupBy value); output size = |distinct values|, never |rows|. */
  private def twoSampleCells(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_type".isin("click", "view"))
      .groupBy($"value")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("c2"))
  }

  /** q114: two-sample Kolmogorov-Smirnov statistic, D = sup|F1 − F2|,
    * between the click and view value distributions. Empirical CDFs come
    * from exact LONG prefix sums over the distinct-value table via the
    * distributed scan (range repartition + per-partition offsets); the
    * per-value |F1−F2| is pure double arithmetic on those longs, rounded
    * to 6 dp BEFORE the max so the winner is identical in both engines. */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = twoSampleCells(s, dir)
    val scanned = DistributedScan.prefixSums(cells, Seq(col("value")), Seq("c1", "c2"))
    val totals = cells.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      .withColumn("one", pmod($"n1", lit(1L)))
    scanned.withColumn("one", pmod($"c1_cum", lit(1L)))
      .join(broadcast(totals), "one")
      .select($"n1", $"n2",
        round(abs($"c1_cum".cast("double") / $"n1".cast("double") -
          $"c2_cum".cast("double") / $"n2".cast("double")), 6).as("d"))
      .groupBy($"n1", $"n2")
      .agg(max($"d").as("ks_d"))
  }
  private val q114Sql =
    """WITH ev AS (SELECT event_type, value FROM events
      |    WHERE event_type IN ('click', 'view')),
      |cells AS (SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM ev GROUP BY value),
      |sc AS (SELECT
      |    CAST(sum(c1) OVER (ORDER BY value) AS BIGINT) AS c1_cum,
      |    CAST(sum(c2) OVER (ORDER BY value) AS BIGINT) AS c2_cum FROM cells),
      |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM cells)
      |SELECT t.n1 AS n1, t.n2 AS n2,
      |  max(round(abs(CAST(c1_cum AS DOUBLE) / n1 - CAST(c2_cum AS DOUBLE) / n2), 6)) AS ks_d
      |FROM sc, t GROUP BY t.n1, t.n2""".stripMargin

  /** q115: Mann-Whitney U (rank-sum) test, tie-corrected, same two
    * samples. Average ranks are kept INTEGER by working in half-units:
    * for a distinct value with combined count c and combined cumulative
    * count cum, avgrank·2 = 2·cum − c + 1 exactly, so the rank-sum
    * R1·2 = Σ c1·(2·cum − c + 1) is an exact LONG sum and the only
    * division (by 2) happens once at the end — U is exact to the half,
    * bit-identical across engines, no rounding needed. U1+U2 = n1·n2 by
    * construction (asserted in the spec). */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = twoSampleCells(s, dir).withColumn("c", $"c1" + $"c2")
    val scanned = DistributedScan.prefixSums(cells, Seq(col("value")), Seq("c"))
    scanned
      .select($"c1", $"c2",
        ($"c1" * (lit(2L) * $"c_cum" - $"c" + lit(1L))).as("contrib"))
      .agg(sum($"contrib").as("r1_2"), sum($"c1").as("n1"), sum($"c2").as("n2"))
      .select($"n1", $"n2",
        (($"r1_2" - $"n1" * ($"n1" + lit(1L))).cast("double") / 2.0).as("u1"),
        ($"n1".cast("double") * $"n2".cast("double") -
          ($"r1_2" - $"n1" * ($"n1" + lit(1L))).cast("double") / 2.0).as("u2"))
  }
  private val q115Sql =
    """WITH ev AS (SELECT event_type, value FROM events
      |    WHERE event_type IN ('click', 'view')),
      |cells AS (SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM ev GROUP BY value),
      |sc AS (SELECT c1, c2,
      |    c1 * (2 * CAST(sum(c1 + c2) OVER (ORDER BY value) AS BIGINT)
      |      - (c1 + c2) + 1) AS contrib
      |  FROM cells),
      |a AS (SELECT CAST(sum(contrib) AS BIGINT) AS r1_2,
      |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM sc)
      |SELECT n1, n2,
      |  CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
      |  CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |    - CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u2
      |FROM a""".stripMargin

  /** Exact fixed-point moment sums for 2-dp (x, y) under a grouping —
    * shared by the OLS and autocorrelation estimators. The per-row hot
    * loop is pure LONG codegen: values lift to integer CENTS
    * (`round(v·100)` — exact for the 2-dp domains the callers feed,
    * residuals ≤1e-9), products stay LONG (loud per-row guard at 2³¹
    * cents, where a product could exceed 2⁶³ — wrap would be silent
    * under non-ANSI Spark while DuckDB raises), and only the
    * ACCUMULATORS are DECIMAL(38,0), overflow-safe at any row count.
    * Moments are scaled back to the value domain as doubles, so caller
    * formulas are unchanged; the oracle replays the identical two-step
    * (exact-integer → double → /scale) rounding. [A/B vs the former
    * per-row DECIMAL(38,8) path: 4× faster at sf0.1 — SCALE.md r11.] */
  private def moments(df: DataFrame, groupCol: String): DataFrame = {
    val lim = 2147483647L
    def cents(c: Column, what: String): Column = {
      val q = round(c * 100).cast("long")
      // two loud preconditions (round-11 self-review): magnitude (a
      // product must fit LONG) and 2-dp EXACTNESS — a 3+-dp input would
      // otherwise be silently cent-quantized on both engines at once,
      // changing the statistic while the parity gate still passes
      when(abs(q) <= lim && abs(c * 100 - round(c * 100)) <= 1e-6, q)
        .otherwise(raise_error(concat(
          lit(s"moments: $what is not an in-range 2-dp value — the LONG " +
            "cents lift would overflow or quantize; widen the scale path"))
          .cast("string"))
          .cast("long"))
    }
    val d = df.select(col(groupCol),
      cents(col("x"), "x").as("qx"), cents(col("y"), "y").as("qy"))
    def acc(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    d.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("n"),
      (acc(col("qx")) / 100.0).as("sx"),
      (acc(col("qy")) / 100.0).as("sy"),
      (acc(col("qx") * col("qy")) / 10000.0).as("sxy"),
      (acc(col("qx") * col("qx")) / 10000.0).as("sxx"),
      (acc(col("qy") * col("qy")) / 10000.0).as("syy"))
  }
  private def covn: Column = col("n") * col("sxy") - col("sx") * col("sy")
  private def varxn: Column = col("n") * col("sxx") - col("sx") * col("sx")
  private def varyn: Column = col("n") * col("syy") - col("sy") * col("sy")
  /** The same moment CTE in DuckDB, from a `base(g, x, y)` relation. */
  private def momentsSql(fromRel: String): String =
    s"""SELECT g, CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(CAST(round(x * 100) AS HUGEINT)) AS DOUBLE) / 100.0 AS sx,
       |    CAST(sum(CAST(round(y * 100) AS HUGEINT)) AS DOUBLE) / 100.0 AS sy,
       |    CAST(sum(CAST(round(x * 100) AS HUGEINT)
       |      * CAST(round(y * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxy,
       |    CAST(sum(CAST(round(x * 100) AS HUGEINT)
       |      * CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxx,
       |    CAST(sum(CAST(round(y * 100) AS HUGEINT)
       |      * CAST(round(y * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS syy
       |  FROM $fromRel GROUP BY g""".stripMargin

  /** q116: per-group ordinary least squares — slope, intercept, R² of
    * extended price on quantity per return flag. One pass of exact decimal
    * moments, then the closed-form normal-equation solution per group. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, dir).select($"l_returnflag".as("g"),
      $"l_quantity".as("x"), $"l_extendedprice".as("y"))
    moments(base, "g")
      .select($"g", $"n".cast("long").as("n"),
        when(varxn =!= 0.0, round(covn / varxn, 6)).as("slope"),
        when(varxn =!= 0.0,
          round(($"sy" - (covn / varxn) * $"sx") / $"n", 6)).as("intercept"),
        when(varxn =!= 0.0 && varyn =!= 0.0,
          round(covn * covn / (varxn * varyn), 6)).as("r2"))
      .orderBy($"g")
  }
  private val q116Sql =
    s"""WITH base AS (SELECT l_returnflag AS g, l_quantity AS x,
       |    l_extendedprice AS y FROM lineitem),
       |m AS (${momentsSql("base")})
       |SELECT g, CAST(n AS BIGINT) AS n,
       |  CASE WHEN n * sxx - sx * sx <> 0.0
       |    THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
       |  CASE WHEN n * sxx - sx * sx <> 0.0
       |    THEN round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
       |    END AS intercept,
       |  CASE WHEN n * sxx - sx * sx <> 0.0 AND n * syy - sy * sy <> 0.0
       |    THEN round((n * sxy - sx * sy) * (n * sxy - sx * sy)
       |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
       |FROM m ORDER BY g""".stripMargin

  /** q117: lag-1 autocorrelation of the value series per event type —
    * serial-dependence check on each event stream. Lag pairs come from a
    * per-type window (partitioned — each type's series sorts in parallel),
    * then the q116 moment machinery computes Pearson r between the series
    * and its shift. √ is correctly-rounded IEEE, so the final formula is
    * bit-identical cross-engine before the 6 dp round. */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"g").orderBy($"ts", $"event_id")
    val base = Tables.events(s, dir)
      .select($"event_type".as("g"), $"ts", $"event_id", $"value".as("y"))
      .withColumn("x", lag($"y", 1).over(w))
      .filter($"x".isNotNull)
    moments(base, "g")
      .select($"g", $"n".cast("long").as("n_pairs"),
        when(varxn > 0.0 && varyn > 0.0,
          round(covn / sqrt(varxn * varyn), 6)).as("autocorr"))
      .orderBy($"g")
  }
  private val q117Sql =
    s"""WITH lagd AS (SELECT event_type AS g,
       |    lag(value) OVER (PARTITION BY event_type
       |      ORDER BY epoch_ns(ts), event_id) AS x,
       |    value AS y FROM events),
       |base AS (SELECT g, x, y FROM lagd WHERE x IS NOT NULL),
       |m AS (${momentsSql("base")})
       |SELECT g, CAST(n AS BIGINT) AS n_pairs,
       |  CASE WHEN n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
       |    THEN round((n * sxy - sx * sy)
       |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS autocorr
       |FROM m ORDER BY g""".stripMargin

  /** Tie-averaged ranks in half-units per (group, value), computed at
    * distinct-value granularity: per-value counts, one distributed scan
    * over the (group, value) order, and a per-group offset (cumulative
    * count of earlier groups, a |groups|-row frame). rank2 = 2·avgrank
    * stays LONG-exact through every step. */
  private def halfRanks(cells: DataFrame, groupCol: String, valCol: String,
                        out: String): DataFrame = {
    val scanned = DistributedScan.prefixSums(
      cells, Seq(col(groupCol), col(valCol)), Seq("cnt"))
    val wOff = Window.orderBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cells.groupBy(col(groupCol)).agg(sum(col("cnt")).as("ft"))
      .withColumn("foff", coalesce(sum(col("ft")).over(wOff), lit(0L)))
      .select(col(groupCol), col("foff"))
    scanned.join(broadcast(offs), groupCol)
      .select(col(groupCol), col(valCol),
        (lit(2L) * (col("cnt_cum") - col("foff")) - col("cnt") + lit(1L)).as(out))
  }

  /** q120: Spearman rank correlation (tie-corrected) per return flag —
    * Pearson on average ranks, the monotonic-association measure. Ranks
    * are computed per DISTINCT value and joined back (two hash joins on
    * (group, value)), so no per-row global sort exists anywhere; moment
    * sums go through DECIMAL(38,0) because squared half-ranks overflow
    * LONG at full scale. Doubling both rank vectors leaves correlation
    * unchanged, so the half-unit trick needs no un-scaling. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, dir).select($"l_returnflag".as("g"),
      $"l_quantity".as("xv"), $"l_extendedprice".as("yv"))
    val xCells = base.groupBy($"g", $"xv").agg(count(lit(1)).as("cnt"))
    val yCells = base.groupBy($"g", $"yv").agg(count(lit(1)).as("cnt"))
    // x-side: quantity is a bounded small-integer domain, so xCells is
    // |groups|x|domain| rows AFTER the aggregate at any data scale — the
    // tiny-frame case where a per-group window is the right tool. Using
    // the distributed scan here cost a second localCheckpoint barrier
    // (measured 5.6 -> 3.5 s warm at sf0.1 removing it); ry keeps the
    // scan because price is near-unique, so its cells ARE data-sized.
    val wx = Window.partitionBy($"g").orderBy($"xv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rx = xCells.select($"g", $"xv",
      (lit(2L) * sum($"cnt").over(wx) - $"cnt" + lit(1L)).as("x"))
    val ry = halfRanks(yCells, "g", "yv", "y")
    // rx is |distinct quantities|x|groups| rows — broadcastable at any
    // scale, so base never shuffles for it; ry is |rows|-sized (price is
    // near-unique), so it shuffle-hash joins (SMJ would sort both sides)
    val ranked = base.join(broadcast(rx), Seq("g", "xv"))
      .join(ry.hint("shuffle_hash"), Seq("g", "yv"))
    // per-row products stay LONG (r11 fixed-point rewrite, 4× A/B —
    // SCALE.md): a half-rank pair multiplies safely below 2^31.5 each,
    // i.e. ~1.5e9 rows per group; past that the old DECIMAL operands
    // would stay exact but non-ANSI LONG would wrap SILENTLY — so the
    // bound is enforced loudly per row instead of documented. Only the
    // accumulators lift to DECIMAL(38,0) (any row count).
    val rkLim = 3037000499L // isqrt(2^63 - 1)
    def guarded(c: Column, what: String) =
      when(abs(c) <= rkLim, c).otherwise(raise_error(
        lit(s"q120: |$what| half-rank exceeds isqrt(2^63) — LONG rank " +
          "products would overflow; lift this group to the decimal path"))
        .cast("long"))
    val g2 = ranked.select($"g",
      guarded($"x", "x").as("x"), guarded($"y", "y").as("y"))
    def acc(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    g2.groupBy($"g").agg(
        count(lit(1)).cast("double").as("n"),
        acc($"x").as("sx"),
        acc($"y").as("sy"),
        acc($"x" * $"y").as("sxy"),
        acc($"x" * $"x").as("sxx"),
        acc($"y" * $"y").as("syy"))
      .select($"g", $"n".cast("long").as("n"),
        when(varxn > 0.0 && varyn > 0.0,
          round(covn / sqrt(varxn * varyn), 6)).as("spearman"))
      .orderBy($"g")
  }
  private val q120Sql =
    """WITH base AS (SELECT l_returnflag AS g, l_quantity AS xv,
      |    l_extendedprice AS yv FROM lineitem),
      |xc AS (SELECT g, xv, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2),
      |yc AS (SELECT g, yv, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2),
      |xr AS (SELECT g, xv,
      |    2 * CAST(sum(cnt) OVER (PARTITION BY g ORDER BY xv) AS BIGINT)
      |      - cnt + 1 AS x FROM xc),
      |yr AS (SELECT g, yv,
      |    2 * CAST(sum(cnt) OVER (PARTITION BY g ORDER BY yv) AS BIGINT)
      |      - cnt + 1 AS y FROM yc),
      |rk AS (SELECT b.g AS g, xr.x AS x, yr.y AS y FROM base b
      |  JOIN xr ON b.g = xr.g AND b.xv = xr.xv
      |  JOIN yr ON b.g = yr.g AND b.yv = yr.yv),
      |m AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      |  FROM rk GROUP BY g)
      |SELECT g, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
      |    THEN round((n * sxy - sx * sy)
      |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS spearman
      |FROM m ORDER BY g""".stripMargin

  /** q180: two-proportion A/B z-test on the deterministic hash split —
    * users are assigned to arms by the SAME md5-bucket function as the
    * q60 corpus split (a pure function of the id: stable under
    * resharding, re-ingest, cluster size), conversion is "ever made a
    * high-value purchase" (value > 150 — on the gate corpus EVERY user
    * has some purchase, so the unconditioned event is degenerate: p = 1
    * collapses the pooled variance to 0 and ANSI division faults), and
    * the z statistic for H0: rate_a = rate_b comes out of the
    * pooled-variance formula, NULL-guarded for the all-or-none corpus
    * where the test is undefined. Everything that crosses rows is a LONG
    * count (one groupBy user, one tiny conditional agg); the z formula is
    * a single double expression over four exact longs — division and sqrt
    * are IEEE-correctly-rounded, so both engines produce the identical
    * bits before the round(…, 6). */
  /** q227: quantile treatment effect — the A/B readout on DISTRIBUTION
    * shape: per-arm exact p25/p50/p75 of purchase value and their
    * differences (quantile lift). The mean-based z-test (q180) misses
    * effects that move the tails without moving the mean; QTE is the
    * standard companion readout. Arms are the q180/q60 hash split (pure
    * function of user id); quantiles use the bounded-memory rank scan
    * ([[graft.operators.DistributedScan.groupedQuantiles]] — purchase
    * `value` is near-continuous and there are exactly TWO arms, so the
    * buffered `percentile` aggregate would hold half the corpus per
    * task at scale; round-12 migration) vs DuckDB's `quantile_cont` —
    * same type-7 interpolation on the dyadic lattice (the q159
    * precedent); deltas subtract the already-6dp-rounded quantiles so
    * they stay bit-stable. */
  private def q227(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arms = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .withColumn("arm",
        when(CurationQueries.hashBucket("user_id") % 2 === 0, "A").otherwise("B"))
    val qs = graft.operators.DistributedScan
      .groupedQuantiles(arms, $"arm", $"value",
        Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"),
        maxGroups = Some(2)) // domain fact: arm ∈ {A, B}
    def armRow(a: String, suffix: String) = qs.filter($"__g" === a)
      .select(round($"p25", 6).as(s"p25_$suffix"),
        round($"p50", 6).as(s"p50_$suffix"),
        round($"p75", 6).as(s"p75_$suffix"))
    // three 1-row frames, LEFT-joined from the counts row: an empty arm
    // (its group vanishes from groupedQuantiles) must surface as NULL
    // quantiles like the oracle's quantile_cont over zero rows, not as a
    // silently empty result (a crossJoin with an empty frame drops the
    // counts row too — the one silent-row-drop path the operator's
    // vanishing-group contract leaves to callers)
    Tables.events(s, dir).filter($"event_type" === "purchase")
      .withColumn("arm",
        when(CurationQueries.hashBucket("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy()
      .agg(sum(when($"arm" === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === "B", 1L).otherwise(0L)).as("n_b"))
      .join(broadcast(armRow("A", "a")), lit(true), "left")
      .join(broadcast(armRow("B", "b")), lit(true), "left")
      .select($"n_a", $"n_b", $"p25_a", $"p50_a", $"p75_a",
        $"p25_b", $"p50_b", $"p75_b",
        round($"p25_b" - $"p25_a", 6).as("qte_25"),
        round($"p50_b" - $"p50_a", 6).as("qte_50"),
        round($"p75_b" - $"p75_a", 6).as("qte_75"))
  }
  private val q227Sql = {
    val bucket = CurationQueries.duckBucket("user_id")
    s"""WITH p AS (SELECT value,
      |    CASE WHEN $bucket % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events WHERE event_type = 'purchase'),
      |q AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    round(quantile_cont(CASE WHEN arm = 'A' THEN value END, 0.25), 6) AS p25_a,
      |    round(quantile_cont(CASE WHEN arm = 'A' THEN value END, 0.5), 6) AS p50_a,
      |    round(quantile_cont(CASE WHEN arm = 'A' THEN value END, 0.75), 6) AS p75_a,
      |    round(quantile_cont(CASE WHEN arm = 'B' THEN value END, 0.25), 6) AS p25_b,
      |    round(quantile_cont(CASE WHEN arm = 'B' THEN value END, 0.5), 6) AS p50_b,
      |    round(quantile_cont(CASE WHEN arm = 'B' THEN value END, 0.75), 6) AS p75_b
      |  FROM p)
      |SELECT n_a, n_b, p25_a, p50_a, p75_a, p25_b, p50_b, p75_b,
      |  round(p25_b - p25_a, 6) AS qte_25,
      |  round(p50_b - p50_a, 6) AS qte_50,
      |  round(p75_b - p75_a, 6) AS qte_75
      |FROM q""".stripMargin
  }

  private def q180(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > 150.0, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("arm",
        when(CurationQueries.hashBucket("user_id") % 2 === 0, "A").otherwise("B"))
    val cells = perUser.groupBy()
      .agg(
        sum(when($"arm" === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === "A", $"conv").otherwise(0L)).as("k_a"),
        sum(when($"arm" === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === "B", $"conv").otherwise(0L)).as("k_b"))
    val (na, ka, nb, kb) = ($"n_a".cast("double"), $"k_a".cast("double"),
      $"n_b".cast("double"), $"k_b".cast("double"))
    val p = (ka + kb) / (na + nb)
    cells.select($"n_a", $"k_a", $"n_b", $"k_b",
      round(ka / na, 6).as("rate_a"),
      round(kb / nb, 6).as("rate_b"),
      when(p === 0.0 || p === 1.0, lit(null).cast("double"))
        .otherwise(round((ka / na - kb / nb) /
          sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb)), 6))
        .as("z"))
  }
  private val q180Sql = {
    val bucket = CurationQueries.duckBucket("user_id")
    s"""WITH per_user AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
      |        THEN 1 ELSE 0 END) AS conv,
      |    CASE WHEN $bucket % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS k_a,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS k_b
      |  FROM per_user)
      |SELECT n_a, k_a, n_b, k_b,
      |  round(CAST(k_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  round(CAST(k_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  CASE WHEN k_a + k_b = 0 OR k_a + k_b = n_a + n_b THEN NULL
      |    ELSE round((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
      |      / sqrt((CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
      |             * (1.0 - CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
      |             * (1.0 / n_a + 1.0 / n_b)), 6) END AS z
      |FROM cells""".stripMargin
  }

  /** q182: Nelson-Aalen cumulative-hazard curve for time-to-first-purchase
    * with right censoring — the survival-analysis primitive (retention /
    * conversion-lag curves) in its SUM form, which unlike Kaplan-Meier's
    * product needs no transcendental functions: H(t) = Σ_{s<=t} d_s/n_s.
    * Per user one groupBy finds first activity and first purchase; users
    * who never convert are censored at the global horizon (max event ts —
    * one broadcast row). The day-grain (d, censored) cells are tiny; the
    * at-risk counts n_t and the hazard prefix sum both go through
    * [[DistributedScan.prefixSums]] — never a single-partition window.
    * Exactness: counts are LONG; each d/n term is one IEEE division
    * rounded to 9 dp and summed as DECIMAL (order-free), so the curve is
    * partitioning-invariant and identical across engines. */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    // constant-key broadcast joins use a DATA-DERIVED zero (pmod of a
    // column): a literal key constant-folds on both sides and Catalyst
    // degrades the equi-join to BroadcastNestedLoop (the q114 trap)
    val horizon = ev.agg(max($"ts").as("tmax"))
      .withColumn("one", pmod($"tmax", lit(1L)))
    val perUser = ev.groupBy($"user_id")
      .agg(min($"ts").as("t0"),
        min(when($"event_type" === "purchase", $"ts")).as("tp"))
      .withColumn("one", pmod($"t0", lit(1L)))
      .join(broadcast(horizon), "one")
      .select(
        when($"tp".isNotNull, expr("(tp - t0) div 86400000000000"))
          .otherwise(expr("(tmax - t0) div 86400000000000")).as("day"),
        when($"tp".isNotNull, 1L).otherwise(0L).as("ev"))
    val cells = perUser.groupBy($"day")
      .agg(sum($"ev").as("d"), count(lit(1)).as("a"))
    val withCum = DistributedScan.prefixSums(cells, Seq(col("day")), Seq("a"))
    val totals = cells.agg(sum($"a").as("n_total"))
      .withColumn("one", pmod($"n_total", lit(1L)))
    val terms = withCum.withColumn("one", pmod($"a_cum", lit(1L)))
      .join(broadcast(totals), "one")
      .select($"day", $"d",
        ($"n_total" - $"a_cum" + $"a").as("n_risk"))
      .withColumn("term",
        round($"d".cast("double") / $"n_risk".cast("double"), 9)
          .cast("decimal(18,9)"))
    DistributedScan.prefixSums(terms, Seq(col("day")), Seq("term"))
      .filter($"d" > 0)
      .select($"day", $"n_risk", $"d".as("d_events"),
        round($"term_cum".cast("double"), 6).as("cum_hazard"))
      .orderBy($"day")
  }
  private val q182Sql =
    """WITH per_user AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      |  FROM events GROUP BY user_id),
      |horizon AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
      |obs AS (
      |  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
      |              ELSE ((SELECT tmax FROM horizon) - t0) // 86400000000
      |         END AS day,
      |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM per_user),
      |cells AS (SELECT day, CAST(sum(ev) AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS a FROM obs GROUP BY day),
      |risk AS (
      |  SELECT day, d,
      |    (SELECT sum(a) FROM cells) - sum(a) OVER (ORDER BY day) + a AS n_risk
      |  FROM cells),
      |terms AS (
      |  SELECT day, d, n_risk,
      |    CAST(round(CAST(d AS DOUBLE) / n_risk, 9) AS DECIMAL(18,9)) AS term
      |  FROM risk)
      |SELECT day, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
      |  round(CAST(sum(term) OVER (ORDER BY day) AS DOUBLE), 6) AS cum_hazard
      |FROM terms WHERE d > 0 ORDER BY day""".stripMargin

  /** q251: difference-in-differences — the experiment readout when
    * treatment was not randomized per event but switched on at a known
    * time: arm (q180's hash split) × period (before/after 2024-01-16)
    * cells of purchase value, mean per cell, and
    * DiD = (T,post − T,pre) − (C,post − C,pre) — the causal effect
    * estimate under the parallel-trends assumption. Every cell is an
    * exact (LONG count, DECIMAL sum) pair, means are single double
    * divisions over those exact cells rounded at 6 dp, and the DiD
    * subtracts the rounded means identically in both engines (q227's
    * rounded-before-delta discipline), so the gate has zero float
    * tolerance. */
  private def q251(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 2024-01-16T00:00:00Z as epoch nanos (events.ts is nanos BIGINT)
    val cutNs = 1705363200000000000L
    val ev = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .withColumn("t",
        when(CurationQueries.hashBucket("user_id") % 2 === 0, 0).otherwise(1))
      .withColumn("post", when($"ts" < cutNs, 0).otherwise(1))
    def cellN(t: Int, p: Int) =
      sum(when($"t" === t && $"post" === p, 1L).otherwise(0L))
    def cellS(t: Int, p: Int) =
      sum(when($"t" === t && $"post" === p, $"value".cast("decimal(28,10)")))
    val cells = ev.groupBy().agg(
      cellN(0, 0).as("n_c_pre"), cellS(0, 0).as("s_c_pre"),
      cellN(0, 1).as("n_c_post"), cellS(0, 1).as("s_c_post"),
      cellN(1, 0).as("n_t_pre"), cellS(1, 0).as("s_t_pre"),
      cellN(1, 1).as("n_t_post"), cellS(1, 1).as("s_t_post"))
    def mean(s0: String, n0: String) =
      round(col(s0).cast("double") / col(n0).cast("double"), 6)
    cells
      .select($"n_c_pre", $"n_c_post", $"n_t_pre", $"n_t_post",
        mean("s_c_pre", "n_c_pre").as("m_c_pre"),
        mean("s_c_post", "n_c_post").as("m_c_post"),
        mean("s_t_pre", "n_t_pre").as("m_t_pre"),
        mean("s_t_post", "n_t_post").as("m_t_post"))
      .select($"*",
        round(($"m_t_post" - $"m_t_pre") - ($"m_c_post" - $"m_c_pre"), 6)
          .as("did6"))
  }
  private val q251Sql = {
    val bucket = CurationQueries.duckBucket("user_id")
    s"""WITH p AS (SELECT value,
       |    CASE WHEN $bucket % 2 = 0 THEN 0 ELSE 1 END AS t,
       |    CASE WHEN epoch_ns(ts) < 1705363200000000000 THEN 0 ELSE 1 END
       |      AS post
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (SELECT
       |    CAST(sum(CASE WHEN t = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
       |    sum(CASE WHEN t = 0 AND post = 0 THEN CAST(value AS DECIMAL(28,10)) END) AS s_c_pre,
       |    CAST(sum(CASE WHEN t = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
       |    sum(CASE WHEN t = 0 AND post = 1 THEN CAST(value AS DECIMAL(28,10)) END) AS s_c_post,
       |    CAST(sum(CASE WHEN t = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
       |    sum(CASE WHEN t = 1 AND post = 0 THEN CAST(value AS DECIMAL(28,10)) END) AS s_t_pre,
       |    CAST(sum(CASE WHEN t = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
       |    sum(CASE WHEN t = 1 AND post = 1 THEN CAST(value AS DECIMAL(28,10)) END) AS s_t_post
       |  FROM p),
       |m AS (SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       |    round(CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE), 6) AS m_c_pre,
       |    round(CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE), 6) AS m_c_post,
       |    round(CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE), 6) AS m_t_pre,
       |    round(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE), 6) AS m_t_post
       |  FROM c)
       |SELECT *, round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did6
       |FROM m""".stripMargin
  }

  /** q278: Welch's unequal-variance t-test on per-user revenue across the
    * q180 hash arms — the continuous-metric companion to q180's
    * proportion z-test (the test an experimentation platform actually
    * runs on revenue, where variances differ by construction). Per-user
    * cents totals are exact longs, each arm collapses to the exact
    * moment cells (n, Σx, Σx²) — one combinable aggregate, six numbers
    * total — and t plus the Welch–Satterthwaite df are computed from
    * those cells with formulas written textually identically in both
    * engines (q243's moment discipline), rounded at 6 dp. Guards: both
    * arms need n ≥ 2 and a positive variance sum or t/df are NULL —
    * same CASE in both engines. */
  private def q278(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(CurationQueries.hashBucket("user_id") % 2 === 0, "A").otherwise("B"))
    val cells = perUser.groupBy().agg(
      sum(when($"arm" === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === "A", $"cents").otherwise(0L)).as("sx_a"),
      sum(when($"arm" === "A", $"cents" * $"cents").otherwise(0L)).as("sxx_a"),
      sum(when($"arm" === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when($"arm" === "B", $"cents").otherwise(0L)).as("sx_b"),
      sum(when($"arm" === "B", $"cents" * $"cents").otherwise(0L)).as("sxx_b"))
    val (na, sa, ssa) = ($"n_a".cast("double"), $"sx_a".cast("double"),
      $"sxx_a".cast("double"))
    val (nb, sb, ssb) = ($"n_b".cast("double"), $"sx_b".cast("double"),
      $"sxx_b".cast("double"))
    val va = (ssa - sa * sa / na) / (na - 1.0)
    val vb = (ssb - sb * sb / nb) / (nb - 1.0)
    val se2 = va / na + vb / nb
    cells.select($"n_a", $"n_b",
      round(sa / na / 100.0, 6).as("mean_a"),
      round(sb / nb / 100.0, 6).as("mean_b"),
      when($"n_a" < 2 || $"n_b" < 2 || se2 <= 0.0, lit(null).cast("double"))
        .otherwise(round((sa / na - sb / nb) / sqrt(se2), 6))
        .as("t6"),
      when($"n_a" < 2 || $"n_b" < 2 || se2 <= 0.0, lit(null).cast("double"))
        .otherwise(round(se2 * se2 /
          ((va / na) * (va / na) / (na - 1.0) +
            (vb / nb) * (vb / nb) / (nb - 1.0)), 6)).as("df6"))
  }
  private val q278Sql = {
    val bucket = CurationQueries.duckBucket("user_id")
    s"""WITH per_user AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |    CASE WHEN $bucket % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events GROUP BY user_id),
      |cells AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT) AS sx_a,
      |    CAST(sum(CASE WHEN arm = 'A' THEN cents * cents ELSE 0 END) AS BIGINT) AS sxx_a,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT) AS sx_b,
      |    CAST(sum(CASE WHEN arm = 'B' THEN cents * cents ELSE 0 END) AS BIGINT) AS sxx_b
      |  FROM per_user),
      |d AS (SELECT n_a, n_b, sx_a, sx_b,
      |    CAST(n_a AS DOUBLE) AS na, CAST(sx_a AS DOUBLE) AS sa,
      |    CAST(sxx_a AS DOUBLE) AS ssa,
      |    CAST(n_b AS DOUBLE) AS nb, CAST(sx_b AS DOUBLE) AS sb,
      |    CAST(sxx_b AS DOUBLE) AS ssb
      |  FROM cells),
      |v AS (SELECT *,
      |    (ssa - sa * sa / na) / (na - 1.0) AS va,
      |    (ssb - sb * sb / nb) / (nb - 1.0) AS vb
      |  FROM d),
      |e AS (SELECT *, va / na + vb / nb AS se2 FROM v)
      |SELECT n_a, n_b,
      |  round(sa / na / 100.0, 6) AS mean_a,
      |  round(sb / nb / 100.0, 6) AS mean_b,
      |  CASE WHEN n_a < 2 OR n_b < 2 OR se2 <= 0.0 THEN NULL
      |    ELSE round((sa / na - sb / nb) / sqrt(se2), 6) END AS t6,
      |  CASE WHEN n_a < 2 OR n_b < 2 OR se2 <= 0.0 THEN NULL
      |    ELSE round(se2 * se2 /
      |      ((va / na) * (va / na) / (na - 1.0) +
      |       (vb / nb) * (vb / nb) / (nb - 1.0)), 6) END AS df6
      |FROM e""".stripMargin
  }

  /** q289: one-way ANOVA F across ALL event types (k > 2 — where the
    * pairwise tests q180/q278 stop): does mean per-event revenue differ
    * anywhere among the groups? Per-group exact cells (n, Σcents,
    * Σcents²) — one combinable aggregate, 3k numbers — then
    * F = (SSB/(k−1)) / (SSW/(n−k)) with SSB/SSW assembled from the
    * cells in doubles, identical expression text in both engines
    * (q278's moment discipline). Per-group SSW/SSB terms are doubles,
    * but their cross-group SUM is order-pinned by rounding each term at
    * 6 dp and summing as exact DECIMAL — a float sum over even a k-row
    * frame would depend on partition order. Output: F and the df pair. */
  private def q289(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, dir)
      .withColumn("cents", round($"value" * 100).cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sx"),
        sum($"cents" * $"cents").as("sxx"))
    // tiny k-row frame: assemble grand cells in deterministic group order
    val g = cells.orderBy($"event_type")
      .agg(count(lit(1)).as("k"), sum($"n").as("nt"),
        sum($"sx").as("sxt"),
        sum(round($"sxx".cast("double") -
          ($"sx".cast("double") * $"sx" / $"n"), 6)
          .cast("decimal(38,6)")).cast("double").as("ssw"),
        sum(round($"sx".cast("double") * $"sx" / $"n", 6)
          .cast("decimal(38,6)")).cast("double").as("sb_raw"))
    g.select($"k", $"nt",
        round(((($"sb_raw" - $"sxt".cast("double") * $"sxt" / $"nt")
            / ($"k" - 1.0)) /
          ($"ssw" / ($"nt".cast("double") - $"k"))), 6).as("f6"))
      .select($"k", $"nt".as("n_total"), $"f6")
  }
  private val q289Sql =
    """WITH cells AS (SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)
      |      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
      |  FROM events GROUP BY 1 ORDER BY 1),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(n) AS BIGINT) AS nt,
      |    CAST(sum(sx) AS BIGINT) AS sxt,
      |    CAST(sum(CAST(round(CAST(sxx AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) * sx / n), 6) AS DECIMAL(38,6)))
      |      AS DOUBLE) AS ssw,
      |    CAST(sum(CAST(round(CAST(sx AS DOUBLE) * sx / n, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) AS sb_raw
      |  FROM cells)
      |SELECT k, nt AS n_total,
      |  round(((sb_raw - CAST(sxt AS DOUBLE) * sxt / nt) / (k - 1.0))
      |    / (ssw / (CAST(nt AS DOUBLE) - k)), 6) AS f6
      |FROM g""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q114_ks_test", q114, Some(q114Sql)),
    QueryDef("q278_welch_ttest", q278, Some(q278Sql)),
    QueryDef("q289_anova_f", q289, Some(q289Sql)),
    QueryDef("q251_diff_in_diff", q251, Some(q251Sql)),
    QueryDef("q180_ab_ztest", q180, Some(q180Sql)),
    QueryDef("q227_quantile_lift", q227, Some(q227Sql)),
    QueryDef("q182_cum_hazard", q182, Some(q182Sql)),
    QueryDef("q115_mannwhitney_u", q115, Some(q115Sql)),
    QueryDef("q116_group_ols", q116, Some(q116Sql)),
    QueryDef("q117_autocorr", q117, Some(q117Sql)),
    QueryDef("q120_spearman", q120, Some(q120Sql)),
  )
}
