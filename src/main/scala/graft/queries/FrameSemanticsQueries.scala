package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ANSI window-frame semantics Spark's window operator does not speak
  * natively: frame EXCLUDE clauses and GROUPS mode. Both are rewritten to
  * algebraic identities over Spark's ROWS/RANGE frames so the plan stays a
  * single exchange + sort per window family (no self-joins), and both are
  * gated against DuckDB running the LITERAL ANSI form — the oracle uses
  * `EXCLUDE CURRENT ROW` / `GROUPS BETWEEN` spelled out, so the gate
  * proves the rewrite, not just the arithmetic.
  *
  * Scale: identical posture to every other window gate — one shuffle on
  * the partition key, one sort; the rewrites add only expression work
  * (a subtraction, a dense_rank reuse of the same sort order), never a
  * second exchange (CollapseWindow folds the stacked windows; the
  * FrameSemanticsSpec plan assertion pins exactly one Exchange).
  */
object FrameSemanticsQueries extends QueryModule {

  /** q209: leave-one-out peer statistics — for each lineitem, the average
    * extended price of the SURROUNDING frame (±3 rows by ship order)
    * excluding the row itself: ANSI `ROWS BETWEEN 3 PRECEDING AND 3
    * FOLLOWING EXCLUDE CURRENT ROW`. The standard peer-comparison /
    * anomaly-baseline shape (is this row priced like its neighbors?).
    * Spark has no EXCLUDE clause, so the engine computes the INCLUSIVE
    * frame sum/count (exact DECIMAL) and subtracts the current row —
    * algebraically identical for distributive aggregates, one extra
    * projection, zero extra exchanges. The peer average divides exact
    * cents once, at the end; single-peer-count-zero guards to NULL. */
  private def q209(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    val f = w.rowsBetween(-3, 3)
    Tables.lineitem(s, dir)
      .withColumn("price_dec", $"l_extendedprice".cast("decimal(18,2)"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice".as("price"),
        (count(lit(1)).over(f) - 1).as("peer_cnt"),
        (sum($"price_dec").over(f) - $"price_dec").as("peer_sum_dec"))
      .withColumn("peer_avg", when($"peer_cnt" > 0,
        round($"peer_sum_dec".cast("double") / $"peer_cnt", 6)))
      .drop("peer_sum_dec")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }
  private val q209Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  l_extendedprice AS price,
      |  count(*) OVER wx AS peer_cnt,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER wx AS DOUBLE)
      |        / nullif(count(*) OVER wx, 0), 6) AS peer_avg
      |FROM lineitem
      |WINDOW wx AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** q210: GROUPS-mode frame — per supplier, the shipped-quantity total
    * over the current SHIP DAY and the adjacent ship days present in the
    * data (`GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING`): the
    * "previous/next trading session" semantics where ROWS frames split
    * peer days arbitrarily and RANGE frames break on calendar gaps
    * (a missing day must NOT leave a hole — the neighbor GROUP is the
    * nearest day with data, whatever its date). Spark has no GROUPS mode;
    * the engine dense_ranks the day within the supplier — same sort
    * order, so CollapseWindow keeps one exchange — and runs a RANGE frame
    * on that dense index, which is exactly the GROUPS frame. Sum is
    * DECIMAL-exact; every row of a day carries the same group stats. */
  private def q210(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = Window.partitionBy($"l_suppkey").orderBy($"day")
    val gframe = Window.partitionBy($"l_suppkey").orderBy($"di")
      .rangeBetween(-1, 1)
    Tables.lineitem(s, dir)
      .withColumn("day", to_date($"l_shipdate"))
      .withColumn("qty", $"l_quantity".cast("decimal(18,2)"))
      .withColumn("di", dense_rank().over(byDay))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"day",
        sum($"qty").over(gframe).cast("double").as("qty_3day_groups"),
        count(lit(1)).over(gframe).as("rows_3day_groups"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }
  // The pinned oracle engine (DuckDB 1.0.0 — checked 2026-08: `GROUPS
  // mode for window functions is not implemented yet`) lacks GROUPS, so
  // the oracle derives the same semantics by an INDEPENDENT shape:
  // aggregate per (supplier, day), index days, self-join the day-grain
  // aggregates within ±1 index, re-attach per row. Two engines, two
  // formulations, one answer — the rewrite is cross-checked, not
  // mirrored. If the pinned DuckDB ever gains GROUPS, switch this oracle
  // to the literal `GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING` clause.
  private val q210Sql =
    """WITH d AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |i AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey
      |    ORDER BY day) AS di FROM d),
      |g AS (SELECT a.l_suppkey, a.day,
      |    CAST(sum(b.qty) AS DOUBLE) AS qty_3day_groups,
      |    CAST(sum(b.n) AS BIGINT) AS rows_3day_groups
      |  FROM i a JOIN i b ON a.l_suppkey = b.l_suppkey
      |    AND b.di BETWEEN a.di - 1 AND a.di + 1
      |  GROUP BY 1, 2)
      |SELECT l.l_suppkey, l.l_orderkey, l.l_linenumber, g.day,
      |  g.qty_3day_groups, g.rows_3day_groups
      |FROM lineitem l JOIN g ON l.l_suppkey = g.l_suppkey
      |  AND CAST(l.l_shipdate AS DATE) = g.day
      |ORDER BY l.l_suppkey, l.l_orderkey, l.l_linenumber""".stripMargin

  /** q220: the other two ANSI frame exclusions — EXCLUDE GROUP (drop the
    * current row AND its order-by peers from the frame) and EXCLUDE TIES
    * (drop the peers but keep the current row). Pinned to a RANGE frame
    * deliberately: a value-range frame that spans offset 0 always
    * contains the FULL peer group, so the rewrites are exact algebra —
    * group-excluded = frame − peers, ties-excluded = frame − peers +
    * self — whereas under a ROWS frame a tie group can straddle the
    * frame edge and the subtraction would remove rows the frame never
    * held. The peer aggregate is RANGE BETWEEN CURRENT ROW AND CURRENT
    * ROW over the SAME sort, so CollapseWindow keeps the whole family on
    * one exchange (plan-asserted). Use case: "surrounding days vs today"
    * baselines where same-day rows must not contaminate the baseline. */
  private def q220(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Window.partitionBy($"l_suppkey").orderBy($"dnum")
    val frame = ord.rangeBetween(-2, 2)
    val peers = ord.rangeBetween(0, 0)
    Tables.lineitem(s, dir)
      .withColumn("dnum", datediff(to_date($"l_shipdate"), lit("1970-01-01")))
      .withColumn("qty", $"l_quantity".cast("decimal(18,2)"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"dnum",
        (sum($"qty").over(frame) - sum($"qty").over(peers))
          .cast("double").as("qty_excl_group"),
        (sum($"qty").over(frame) - sum($"qty").over(peers) + $"qty")
          .cast("double").as("qty_excl_ties"),
        (count(lit(1)).over(frame) - count(lit(1)).over(peers)).as("n_excl_group"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }
  private val q220Sql =
    """WITH li AS (SELECT l_suppkey, l_orderkey, l_linenumber,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS dnum,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty
      |  FROM lineitem)
      |SELECT l_suppkey, l_orderkey, l_linenumber, dnum,
      |  CAST(coalesce(sum(qty) OVER weg, 0) AS DOUBLE) AS qty_excl_group,
      |  CAST(sum(qty) OVER wet AS DOUBLE) AS qty_excl_ties,
      |  count(*) OVER weg AS n_excl_group
      |FROM li
      |WINDOW weg AS (PARTITION BY l_suppkey ORDER BY dnum
      |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP),
      |  wet AS (PARTITION BY l_suppkey ORDER BY dnum
      |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q209_window_exclude", q209, Some(q209Sql)),
    QueryDef("q210_groups_frame", q210, Some(q210Sql)),
    QueryDef("q220_exclude_group_ties", q220, Some(q220Sql)),
  )
}
