package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. These are the
  * inputs for every `SparkEntry.queries` entry; the driver runs the matching
  * `SparkEntry.oracleSql` in DuckDB over the same files.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * indirection keeps the query code independent of the physical layout so the
  * swap is a one-line change here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The engine-wide contract for `events.ts` is EPOCH-NANOSECOND LONG:
    * every gate query, oracle statement, and spec does exact integer
    * arithmetic on it (`ts div 1000` → µs, `div 86400000000000` → days),
    * which is the deterministic, hash-stable form — no timezone, no
    * engine-specific timestamp rendering. Source files have carried the
    * instant as either parquet TIMESTAMP(NANOS) (read natively as long
    * via `nanosAsLong`) or TIMESTAMP(MICROS)/NTZ; this shim normalizes
    * any timestamp physical type to the long-ns view so the logical
    * contract survives upstream layout changes. The µs→ns widening is
    * exact (×1000), and with the session pinned to UTC the NTZ cast is
    * wall-clock-preserving, so `ts div 1000` equals DuckDB's
    * `epoch_us(ts)` on the same file — the identity the oracles rely on. */
  private def tsAsEpochNanos(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        import org.apache.spark.sql.functions.{col, unix_micros}
        // predicates against the derived column can't reach the parquet
        // scan by themselves; the transposition rule (exact inverse on the
        // µs lattice) restores row-group/partition pruning for time splits
        SessionRules.ensureOptimizerRule(
          spark, org.apache.spark.sql.graft.EpochNanosPredicatePushdown)
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = tsAsEpochNanos(spark, load(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
