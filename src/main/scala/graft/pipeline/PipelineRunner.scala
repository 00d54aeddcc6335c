package graft.pipeline

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.SparkSession

/** Linear bronze → silver → gold → DQ orchestration.
  *
  * The reference runs its four notebooks as a linear Databricks Job whose
  * stages communicate only through tables (README.md:100-108, SURVEY §3.3);
  * this runner mirrors that: each stage reads its inputs from the catalog
  * and persists outputs before the next stage starts, so any stage can be
  * re-run independently and the whole pipeline is restart-safe.
  */
object PipelineRunner {

  final case class RunResult(bronzeRows: Long, silverRows: Long,
                             rejectedRows: Long, goldRows: Long, dqRows: Long)

  def run(spark: SparkSession, warehouseDir: String, csvDir: String,
          source: String = "stooq",
          now: Timestamp = new Timestamp(System.currentTimeMillis()),
          today: Date = new Date(System.currentTimeMillis())): RunResult =
    runConfigured(spark, warehouseDir,
      PipelineConfig(rawInputDir = csvDir, source = source), now, today)

  /** Config-driven variant (reference config.yaml → PipelineConfig):
    * paths, source, symbol whitelist, date bounds, table names, and DQ
    * thresholds all come from the config object. */
  def runConfigured(spark: SparkSession, warehouseDir: String,
                    config: PipelineConfig,
                    now: Timestamp = new Timestamp(System.currentTimeMillis()),
                    today: Date = new Date(System.currentTimeMillis())): RunResult = {
    val names = config.tables
    val catalog = new Catalog(spark, warehouseDir, names)
    val bronze = BronzeIngest.run(spark, catalog, config.rawInputDir,
      config.source, now, names, config.symbols, config.startDate, config.endDate)
    val (silver, rejected) = SilverTransform.run(spark, catalog, names)
    val gold = GoldFeatures.run(spark, catalog, now, names)
    val dq = QualityChecks.run(spark, catalog, now, today, names, config.thresholds)
    RunResult(bronze.count(), silver.count(), rejected.count(), gold.count(), dq.count())
  }
}
