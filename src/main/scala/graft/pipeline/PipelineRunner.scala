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
          today: Date = new Date(System.currentTimeMillis())): RunResult = {
    val catalog = new Catalog(spark, warehouseDir)
    val bronze = BronzeIngest.run(spark, catalog, csvDir, source, now)
    val (silver, rejected) = SilverTransform.run(spark, catalog)
    val gold = GoldFeatures.run(spark, catalog, now)
    val dq = QualityChecks.run(spark, catalog, now, today)
    RunResult(bronze.count(), silver.count(), rejected.count(), gold.count(), dq.count())
  }
}
