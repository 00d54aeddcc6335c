package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured surface: JSON parsing into typed structs, map and
  * struct construction/access. Spark evaluates the real from_json/map/
  * struct operators; the oracle derives the same values from the one JSON
  * field arithmetically, so the check is engine-portable.
  */
object SemiStructuredQueries extends QueryModule {

  /** q55: from_json → struct field, map construction/keys/values, struct
    * access, JSON null-safety on a corrupted row. */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("parsed", from_json($"props", StructType(Seq(
        StructField("k", LongType)))))
      .withColumn("k", $"parsed.k")
      .withColumn("m", map(lit("k"), $"k", lit("k2"), $"k" * 2))
      .withColumn("st", struct($"k".as("a"), ($"k" * 3).as("b")))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_parsed"),
        sum($"k").as("sum_k"),
        sum(element_at($"m", "k2")).as("sum_k2"),
        sum($"st.b").as("sum_b"),
        first(array_join(array_sort(map_keys($"m")), ","), ignoreNulls = true).as("keys"))
      .orderBy($"event_type")
  }
  private val q55Sql =
    """WITH e AS (SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type,
      |  count(k) AS n_parsed,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(k * 2) AS BIGINT) AS sum_k2,
      |  CAST(sum(k * 3) AS BIGINT) AS sum_b,
      |  'k,k2' AS keys
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q55_json_map_struct", q55, Some(q55Sql)),
  )
}
