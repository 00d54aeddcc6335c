package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join-shaped operator surface: the reference's interval self-join
  * (sql/example_queries.sql:137-149), MERGE emulation (SURVEY §7.3), and the
  * semi/anti primitives the MERGE rewrite is built from.
  */
object JoinQueries extends QueryModule {

  private val dec = DecimalType(18, 2)

  /** J1: equi + range (interval) self-join — trailing-60-day order history
    * per customer. Plans as a shuffled join on the equi key (o_custkey) with
    * the date range as residual, THROUGH the lossless hot-key salt guard
    * ([[graft.operators.SkewedSelfJoin]]): an in-plan count probe marks keys
    * whose match side exceeds the threshold and splits their anchor rows
    * across salt buckets with the match side replicated per bucket — AQE's
    * skew split cannot separate one key's rows, so a hot symbol/customer
    * would otherwise pin the whole key group on one quadratic task (the
    * 100× hazard SURVEY §4 flags on the reference's interval self-join).
    * Zero hot keys at gate scale: the salted branch is empty and the plan
    * degrades to the plain shuffled join (hash-identical results either
    * way — SkewedSelfJoinSpec proves pair-multiset equality on a planted
    * hot key). */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val anchor = o.select($"o_custkey", $"o_orderkey",
      $"o_orderdate".cast(DateType).as("od"))
    val matchSide = o.select($"o_custkey",
      $"o_orderdate".cast(DateType).as("m_od"),
      $"o_totalprice".as("m_price"))
    graft.operators.SkewedSelfJoin.saltedIntervalJoin(
        anchor, matchSide, "o_custkey",
        $"m_od".between(date_sub($"od", 60), $"od"),
        hotThreshold = 10000)
      .groupBy($"o_custkey", $"o_orderkey")
      .agg(
        count(lit(1)).as("n_trailing"),
        sum($"m_price".cast(dec)).cast(DoubleType).as("trailing_spend"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val q11Sql =
    """SELECT g.o_custkey, g.o_orderkey,
      |  count(*) AS n_trailing,
      |  CAST(sum(CAST(g2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS trailing_spend
      |FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice FROM orders) g
      |JOIN (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice FROM orders) g2
      |  ON g.o_custkey = g2.o_custkey
      | AND g2.od BETWEEN g.od - INTERVAL 60 DAY AND g.od
      |GROUP BY g.o_custkey, g.o_orderkey
      |ORDER BY g.o_custkey, g.o_orderkey""".stripMargin

  /** Left-semi and left-anti joins (EXISTS / NOT EXISTS) — the two halves of
    * the MERGE rewrite. Output is a two-row summary. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select($"o_custkey")
    def side(label: String, joinType: String) =
      c.join(o, $"c_custkey" === $"o_custkey", joinType)
        .agg(count(lit(1)).as("n"))
        .select(lit(label).as("side"), $"n")
    side("with_orders", "left_semi")
      .unionAll(side("without_orders", "left_anti"))
      .orderBy($"side")
  }
  private val q12Sql =
    """SELECT * FROM (
      |  SELECT 'with_orders' AS side, count(*) AS n FROM customer
      |    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT 'without_orders', count(*) FROM customer
      |    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) t
      |ORDER BY side""".stripMargin

  /** S6/J2: MERGE INTO emulation without Delta (SURVEY §7.3) — incoming rows
    * win on key collision (UPDATE-all semantics), unmatched target rows are
    * kept, unmatched incoming rows are inserts:
    * merged = incoming ∪ (target ⟕anti incoming). Idempotent by construction.
    * At scale this pairs with dynamic partition overwrite so only touched
    * partitions rewrite. Summary output proves update-wins semantics. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val target = o.filter($"o_orderdate" < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      .withColumn("src", lit("target"))
    val incoming = o.filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .withColumn("src", lit("incoming"))
    val merged = incoming.unionByName(
      target.join(incoming.select($"o_orderkey".as("ik")),
        $"o_orderkey" === $"ik", "left_anti"))
    merged.groupBy($"src")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(dec)).cast(DoubleType).as("total"))
      .orderBy($"src")
  }
  private val q13Sql =
    """WITH target AS (
      |  SELECT *, 'target' AS src FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      |incoming AS (
      |  SELECT *, 'incoming' AS src FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
      |merged AS (
      |  SELECT * FROM incoming
      |  UNION ALL
      |  SELECT * FROM target t
      |  WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.o_orderkey = t.o_orderkey))
      |SELECT src, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM merged GROUP BY src ORDER BY src""".stripMargin

  /** Broadcast star join over the full dimension chain
    * region→nation→customer→orders: every dim side is broadcast, so the only
    * shuffle is the final aggregation. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(dec)).cast(DoubleType).as("region_sales"))
      .orderBy($"r_name", $"n_name")
  }
  private val q14Sql =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS region_sales
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q349: TPC-H Q13-shaped customer-order distribution — the canonical
    * OUTER-join-with-ON-clause-filter trap plus a two-level aggregate:
    * count each customer's non-urgent orders with the predicate INSIDE
    * the join condition (moving `o_orderpriority <> '1-URGENT'` to a
    * WHERE would silently DROP the zero-order customers the outer join
    * exists to preserve — this gate pins the distinction), then the
    * distribution of those counts. Both engines run the literal
    * two-level shape, so the hash also pins COUNT(col)'s null-skipping
    * over unmatched outer rows.
    *
    * Scale shape: one shuffle on the join key (orders side filtered
    * before the exchange by Catalyst — ON-clause pushdown to the
    * non-preserved side is safe and the plan is asserted by parity, not
    * assumed), one map-side-combinable count per customer, then a
    * second aggregate over the |distinct counts| ≤ few-hundred-row
    * frame. Deterministic order: c_count is unique as the second-level
    * group key, so (custdist DESC, c_count DESC) is total. */
  private def q349(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT",
        "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  private val q349Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q349_order_count_dist", q349, Some(q349Sql)),
    QueryDef("q11_range_self_join", q11, Some(q11Sql)),
    QueryDef("q12_semi_anti_join", q12, Some(q12Sql)),
    QueryDef("q13_merge_upsert", q13, Some(q13Sql)),
    QueryDef("q14_star_broadcast_join", q14, Some(q14Sql)),
  )
}
