package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** File-source streaming ingest: exactly-once across restarts via the
  * checkpoint, new files picked up incrementally. */
class StreamingIngestSpec extends SparkTestBase {

  private def writeCsv(dir: String, name: String, rows: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name),
      "Date,Open,High,Low,Close,Volume\n" + rows.stripMargin.trim + "\n")

  test("ingests present files once, picks up new files, survives restart") {
    val csvDir = tmpDir("stream-csv")
    val outDir = tmpDir("stream-out") + "/bronze"
    val ckDir = tmpDir("stream-ck")

    writeCsv(csvDir, "SPY.csv",
      """2026-01-02,100,101,99,100.5,1000
        |2026-01-03,100.6,102,100,101.2,1100""")

    val q1 = StreamingIngest.start(spark, csvDir, outDir, ckDir)
    q1.awaitTermination()
    val read1 = spark.read.parquet(outDir)
    assert(read1.count() == 2)
    assert(read1.select("symbol").distinct().collect().map(_.getString(0)).toSeq == Seq("SPY"))

    // restart with no new files: nothing re-ingested
    val q2 = StreamingIngest.start(spark, csvDir, outDir, ckDir)
    q2.awaitTermination()
    assert(spark.read.parquet(outDir).count() == 2)

    // new file arrives: only it is processed
    writeCsv(csvDir, "GLD.csv", """2026-01-02,50,51,49,50.5,500""")
    val q3 = StreamingIngest.start(spark, csvDir, outDir, ckDir)
    q3.awaitTermination()
    val read3 = spark.read.parquet(outDir)
    assert(read3.count() == 3)
    assert(read3.filter(col("symbol") === "GLD").count() == 1)
  }
}
