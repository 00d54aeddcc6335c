package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.IntervalJoinStrategy

/** The custom broadcast interval join under the correctness gate: the
  * strategy is registered on the session so the driver's verify run
  * executes BroadcastIntervalJoinExec, and the DuckDB oracle checks its
  * output via the plain theta-join semantics it must match.
  */
object IntervalJoinQueries extends QueryModule {

  /** q57: bucket events by value bands derived from the nation table
    * (25 disjoint-by-construction [4k, 4k+2] bands over value∈[0,100]) —
    * planned by IntervalJoinStrategy (pattern-gated; registering it is
    * idempotent and harmless to other queries). */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.SessionRules.ensureStrategy(s)(
      _.isInstanceOf[IntervalJoinStrategy], IntervalJoinStrategy(s))

    val bands = Tables.nation(s, dir)
      .select($"n_nationkey".as("band_id"),
        ($"n_nationkey" * 4.0).as("lo"),
        ($"n_nationkey" * 4.0 + 2.0).as("hi"))
    Tables.events(s, dir)
      .select($"event_id", $"value")
      .join(bands, $"value" >= $"lo" && $"value" <= $"hi")
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
      .orderBy($"band_id")
  }
  private val q57Sql =
    """WITH bands AS (SELECT n_nationkey AS band_id,
      |    n_nationkey * 4.0 AS lo, n_nationkey * 4.0 + 2.0 AS hi
      |  FROM nation)
      |SELECT band_id, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events JOIN bands ON value >= lo AND value <= hi
      |GROUP BY band_id ORDER BY band_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q57_interval_join", q57, Some(q57Sql)),
  )
}
