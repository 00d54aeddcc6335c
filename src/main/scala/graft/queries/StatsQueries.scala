package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregate surface: correlation, covariance, variance
  * family, interpolated percentiles, and ordered string aggregation.
  * Moment-based aggregates are rounded coarsely enough that double
  * accumulation-order differences cannot flip the compare (verified at
  * three SFs).
  */
object StatsQueries extends QueryModule {

  /** q52: moment aggregates + exact interpolated percentiles per group. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 3).as("covar_qp"),
        round(var_samp($"l_quantity"), 6).as("var_qty"),
        round(stddev_pop($"l_quantity"), 6).as("sd_pop_qty"),
        round(expr("percentile(l_quantity, 0.5D)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9D)"), 6).as("p90_qty"))
      .orderBy($"l_returnflag")
  }
  private val q52Sql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qp,
      |  round(var_samp(l_quantity), 6) AS var_qty,
      |  round(stddev_pop(l_quantity), 6) AS sd_pop_qty,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q53: ordered distinct string aggregation (LISTAGG-style) — sorted
    * collect_set keeps the result order-deterministic under any
    * partitioning. */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(
        array_join(array_sort(collect_set($"o_orderpriority")), ",").as("priorities"),
        countDistinct($"o_orderpriority").as("n_priorities"))
      .orderBy($"o_orderstatus")
  }
  private val q53Sql =
    """SELECT o_orderstatus,
      |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
      |  count(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q52_stats_aggregates", q52, Some(q52Sql)),
    QueryDef("q53_string_agg", q53, Some(q53Sql)),
  )
}
