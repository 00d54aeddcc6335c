package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Determinism contract (both sides must obey it, or the driver's hash
  * compare fails spuriously):
  *   - every output column is explicitly aliased, identically in both;
  *   - row order is fully determined (ORDER BY with a unique tie-break)
  *     whenever LIMIT is involved;
  *   - floating-point aggregates are either exact (integer-valued doubles,
  *     decimal-cast money arithmetic) or rounded coarsely enough that
  *     accumulation-order differences cannot flip the rounding.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[QueryDef]
}
