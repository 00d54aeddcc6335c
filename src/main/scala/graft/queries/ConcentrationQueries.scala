package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.DistributedScan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration and composition analytics: hierarchical share-of-parent
  * rollups, sequence-path mining, and the Gini coefficient — "where is the
  * mass concentrated" questions over facts, sessions, and money.
  */
object ConcentrationQueries extends QueryModule {

  /** q130: share-of-parent rollup — customer-nation revenue as a share of
    * its region and of the world, the drill-down composition report.
    * Revenue sums are exact DECIMAL(18,2)-based money arithmetic (the
    * money discipline used since q01); region and grand totals come from
    * window sums over the |nations|-row aggregate (tiny frame), so the
    * fact table is touched exactly once. */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      // multiply IN decimal (exact), never round a double product: the
      // engines' double->decimal cast rounding modes differ (q01 pattern)
      .agg(sum($"l_extendedprice".cast("decimal(12,2)") *
        (lit(BigDecimal("1.00")).cast("decimal(3,2)") -
          $"l_discount".cast("decimal(4,2)"))).as("rev"))
    rev
      .withColumn("r_tot", sum($"rev").over(Window.partitionBy($"r_name")))
      .withColumn("g_tot", sum($"rev").over(Window.partitionBy()))
      .select($"r_name", $"n_name",
        $"rev".cast("double").as("revenue"),
        round($"rev".cast("double") / $"r_tot".cast("double"), 6)
          .as("share_of_region"),
        round($"rev".cast("double") / $"g_tot".cast("double"), 6)
          .as("share_of_total"))
      .orderBy($"r_name", $"n_name")
  }
  private val q130Sql =
    """WITH rev AS (SELECT r.r_name, n.n_name,
      |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |t AS (SELECT *,
      |    sum(rev) OVER (PARTITION BY r_name) AS r_tot,
      |    sum(rev) OVER () AS g_tot FROM rev)
      |SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(r_tot AS DOUBLE), 6) AS share_of_region,
      |  round(CAST(rev AS DOUBLE) / CAST(g_tot AS DOUBLE), 6) AS share_of_total
      |FROM t ORDER BY r_name, n_name""".stripMargin

  /** q131: session-path mining — the most common 3-step event-type paths
    * per user stream (two stacked LAGs over one per-user sort, so both
    * shifts share a single exchange), counted globally with each path's
    * share of all trigrams. The n-gram-over-sequences operator that
    * session analytics and next-event models start from. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tri = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("e3"))
      .withColumn("e2", lag($"e3", 1).over(w))
      .withColumn("e1", lag($"e3", 2).over(w))
      .filter($"e1".isNotNull)
      .groupBy($"e1", $"e2", $"e3").agg(count(lit(1)).as("n_paths"))
    val tot = tri.agg(sum($"n_paths").as("n_tot"))
      .withColumn("one", pmod($"n_tot", lit(1L)))
    tri.withColumn("one", pmod($"n_paths", lit(1L)))
      .join(broadcast(tot), "one")
      .select($"e1", $"e2", $"e3", $"n_paths",
        round($"n_paths".cast("double") / $"n_tot".cast("double"), 6).as("share"))
      .orderBy($"n_paths".desc, $"e1", $"e2", $"e3")
      .limit(25)
  }
  private val q131Sql =
    """WITH seq AS (SELECT event_type AS e3,
      |    lag(event_type, 1) OVER w AS e2,
      |    lag(event_type, 2) OVER w AS e1
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |tri AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
      |  FROM seq WHERE e1 IS NOT NULL GROUP BY 1, 2, 3),
      |t AS (SELECT CAST(sum(n_paths) AS BIGINT) AS n_tot FROM tri)
      |SELECT e1, e2, e3, n_paths,
      |  round(CAST(n_paths AS DOUBLE) / n_tot, 6) AS share
      |FROM tri, t
      |ORDER BY n_paths DESC, e1, e2, e3 LIMIT 25""".stripMargin

  /** q132: Gini coefficient of order value per market segment — the
    * inequality-of-spend statistic. Needs every order's rank in its
    * segment's value order; ranks come at DISTINCT-VALUE granularity from
    * the distributed scan (cells = (segment, value, count)), never a
    * per-row global sort. With value ties, the positions a value block
    * occupies contribute v·(c·cum_before + c(c+1)/2) to Σ rank·value —
    * LONG/DECIMAL-exact per cell via the 2dp money fixed-point (v·100 as
    * BIGINT); the final G = 2·Σ(rank·v)/(n·Σv) − (n+1)/n is one double
    * formula per segment on those exact sums. Scan order is (segment,
    * value); per-segment offsets subtract out, same shape as q120. */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round() before the long cast: Spark's double->long cast truncates
    // while DuckDB's rounds, and 2dp money x100 sits one ulp off an
    // integer often enough to split them; rounding is identical in both.
    val cells = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"),
        round($"o_totalprice" * 100.0, 0).cast("long").as("v"))
      .groupBy($"seg", $"v").agg(count(lit(1)).as("cnt"))
    val scanned = DistributedScan.prefixSums(
      cells, Seq(col("seg"), col("v")), Seq("cnt"))
    val wOff = Window.orderBy($"seg").rowsBetween(Window.unboundedPreceding, -1)
    val offs = cells.groupBy($"seg").agg(sum($"cnt").as("ft"))
      .withColumn("foff", coalesce(sum($"ft").over(wOff), lit(0L)))
      .select($"seg", $"foff")
    scanned.join(broadcast(offs), "seg")
      .withColumn("cumb", $"cnt_cum" - $"foff" - $"cnt")
      .groupBy($"seg")
      .agg(
        sum($"cnt").as("n"),
        // v lifts to DECIMAL BEFORE multiplying: v * (cnt*cumb + ...) in
        // LONG would overflow (and wrap silently, non-ANSI) near sf1
        sum($"v".cast("decimal(38,0)") * $"cnt").as("sv"),
        sum($"v".cast("decimal(38,0)") *
          expr("cnt * cumb + (cnt * (cnt + 1)) div 2")).as("srv"))
      .select($"seg", $"n",
        round($"sv".cast("double") / 100.0, 2).as("total_value"),
        round(lit(2.0) * $"srv".cast("double") /
            ($"n".cast("double") * $"sv".cast("double")) -
          ($"n" + 1L).cast("double") / $"n".cast("double"), 6).as("gini"))
      .orderBy($"seg")
  }
  private val q132Sql =
    """WITH cells AS (SELECT c.c_mktsegment AS seg,
      |    CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |sc AS (SELECT seg, v, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY v) AS BIGINT) - cnt AS cumb
      |  FROM cells),
      |m AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * cnt) AS DOUBLE) AS sv,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * (cnt * cumb + (cnt * (cnt + 1)) // 2))
      |      AS DOUBLE) AS srv
      |  FROM sc GROUP BY 1)
      |SELECT seg, n, round(sv / 100.0, 2) AS total_value,
      |  round(2.0 * srv / (CAST(n AS DOUBLE) * sv)
      |    - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
      |FROM m ORDER BY seg""".stripMargin

  /** q187: pro-rata budget allocation with largest-remainder rounding —
    * split 1,000,000 units across nations proportional to order revenue
    * so the parts are integers and SUM EXACTLY to the budget (floors
    * first, then +1 to the largest remainders until the leftover is
    * spent; ties broken by name). Every step is exact integer
    * arithmetic — the B·rev product runs in DECIMAL(38,0) (HUGEINT on
    * the oracle side) so it cannot wrap even when per-nation revenue
    * cents exceed the ~9.2e12 that would overflow a LONG product at
    * larger scale factors; floor-div and mod on positives agree across
    * engines — so the allocation is bit-deterministic —
    * the property that matters when the "budget" is sampling quotas or
    * shard sizes derived from a 100 TB corpus scan. The fact table is
    * touched once (grouped cents sum); the remainder ranking runs on the
    * |nations|-row aggregate, the same tiny-frame window discipline as
    * q130. */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = lit(1000000L)
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev_cents"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.partitionBy().orderBy($"rem".desc, $"n_name")
    rev
      .withColumn("t", sum($"rev_cents").over(wAll))
      .withColumn("basis", $"rev_cents".cast("decimal(28,0)") * lit(1000000L))
      .withColumn("base", expr("basis div t"))
      .withColumn("rem", expr("basis % t"))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("leftover", budget - sum($"base").over(wAll))
      .select($"n_name", $"rev_cents",
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
          .as("alloc_units"))
      .orderBy($"n_name")
  }
  private val q187Sql =
    """WITH rev AS (
      |  SELECT n_name,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1),
      |x AS (
      |  SELECT n_name, rev_cents,
      |    1000000 * CAST(rev_cents AS HUGEINT)
      |      // (SELECT sum(rev_cents) FROM rev) AS base,
      |    1000000 * CAST(rev_cents AS HUGEINT)
      |      % (SELECT sum(rev_cents) FROM rev) AS rem
      |  FROM rev),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
      |    1000000 - sum(base) OVER () AS leftover
      |  FROM x)
      |SELECT n_name, rev_cents,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_units
      |FROM r ORDER BY n_name""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q130_share_of_parent", q130, Some(q130Sql)),
    QueryDef("q131_event_trigrams", q131, Some(q131Sql)),
    QueryDef("q132_gini", q132, Some(q132Sql)),
    QueryDef("q187_largest_remainder", q187, Some(q187Sql)),
  )
}
