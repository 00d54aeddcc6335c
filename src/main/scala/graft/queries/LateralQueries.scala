package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated LATERAL subquery — per-row dependent subquery with its own
  * ORDER BY/LIMIT (Catalyst plans a LateralJoin; the DataFrame-API
  * equivalent is the window top-k of q19, so both styles are covered).
  */
object LateralQueries extends QueryModule {

  /** q58: top-2 orders per customer via LATERAL. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }
  private val q58Sql =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey <= 300
      |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q58_lateral_topk", q58, Some(q58Sql)),
  )
}
