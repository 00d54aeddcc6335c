package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Silver layer: latest-wins dedup, validity rules, reject routing.
  *
  * Reference: notebooks/silver/02_transform_silver.py. Semantics kept:
  *  - deterministic latest-wins dedup on (symbol,date) by ingested_at DESC
  *    (ROW_NUMBER, 02:36-42 — SURVEY D2; contrast bronze's arbitrary D1);
  *  - validity predicates 02:51-76: key present, prices present, prices
  *    positive, OHLC bounds via greatest/least, volume null-or-nonnegative
  *    (null volume is VALID — FX, 02:72-74);
  *  - reject_reason is the FIRST failing rule in declared order (when-chain,
  *    02:80-87 — order-sensitive first-match, SURVEY P14);
  *  - valid ∪ rejected = deduped input, disjoint (02:89-95);
  *  - both outputs fully overwritten each run (02:136-137).
  */
object SilverTransform {

  /** Validity rules in reject-precedence order (name → failing predicate). */
  def rejectRules: Seq[(String, Column)] = Seq(
    "missing_key" -> (col("symbol").isNull || col("symbol") === "" || col("date").isNull),
    "missing_prices" -> (col("open").isNull || col("high").isNull ||
      col("low").isNull || col("close").isNull),
    "non_positive_price" -> (col("open") <= 0 || col("high") <= 0 ||
      col("low") <= 0 || col("close") <= 0),
    "ohlc_inconsistent" -> (col("high") < greatest(col("open"), col("close"), col("low")) ||
      col("low") > least(col("open"), col("close"), col("high"))),
    "invalid_volume" -> (col("volume").isNotNull && col("volume") < 0))

  /** Latest-wins dedup on (symbol,date): one shuffle on the grain key;
    * ingested_at DESC picks the deterministic survivor. */
  def dedupLatest(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("date"))
      .orderBy(col("ingested_at").desc)
    bronze
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** (valid, rejected): disjoint split of the deduped input; rejected rows
    * carry the first-matching reject_reason. */
  def split(deduped: DataFrame): (DataFrame, DataFrame) = {
    val reason = rejectRules.foldLeft(lit(null).cast("string")) {
      case (acc, (name, cond)) => coalesce(acc, when(cond, lit(name)))
    }
    // NOTE: fold order — coalesce(acc, when(...)) keeps earlier rules'
    // verdicts, so precedence is the declared Seq order (first match wins).
    val tagged = deduped.withColumn("reject_reason", reason)
    val valid = tagged.filter(col("reject_reason").isNull).drop("reject_reason")
    val rejected = tagged.filter(col("reject_reason").isNotNull)
    (valid, rejected)
  }

  def run(spark: SparkSession, catalog: Catalog,
          names: TableNames = TableNames()): (DataFrame, DataFrame) = {
    val bronze = catalog.read(names.bronze)
    val (valid, rejected) = split(dedupLatest(bronze))
    catalog.overwrite(valid, names.silver, Seq("symbol"))
    catalog.overwrite(rejected, names.silverRejected, Seq("symbol"))
    (catalog.read(names.silver), catalog.read(names.silverRejected))
  }
}
