package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partition-count ceiling rehearsal for `Catalog.upsert` (VERDICT r7
  * item 5): the upsert's one driver-side structure is the touched-
  * partition-value collect (`Catalog.scala` — an IN-filter seed bounded by
  * the number of partitions the batch touches, never by rows). This probe
  * measures the worst case — a batch touching EVERY partition — at
  * configurable partition counts, so SCALE.md can record whether wall time
  * stays ~linear in partition count (flat per partition) and the driver
  * heap delta stays bounded by the touched-value list, as the design
  * claims.
  *
  * Usage: runMain graft.tools.UpsertScaleProbe [nPartitions] [rowsPerPart]
  * Prints one JSON line: partitions, upsert seconds, driver heap delta MB,
  * and post-merge row counts (correctness cross-check).
  */
object UpsertScaleProbe {
  def main(args: Array[String]): Unit = {
    val nParts = args.headOption.map(_.toInt).getOrElse(10000)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("upsert_probe").toString
    val cat = new graft.pipeline.Catalog(spark, wh)

    // base table: nParts symbol partitions × rowsPer dates
    val base = spark.range(nParts.toLong * rowsPer)
      .select(concat(lit("s"), (col("id") % nParts)).as("symbol"),
        (col("id") / nParts).cast("long").as("d"),
        lit(1.0).as("v"))
    cat.upsert(base, "probe", Seq("symbol", "d"), Seq("symbol"))

    // worst-case batch: touches EVERY partition — one update + one insert
    val batch = spark.range(nParts.toLong * 2)
      .select(concat(lit("s"), (col("id") % nParts)).as("symbol"),
        when(col("id") < nParts, lit(0L))
          .otherwise(lit(rowsPer.toLong)).as("d"), // d=0 update, d=rowsPer insert
        lit(2.0).as("v"))

    def usedHeap(): Long = {
      System.gc(); Thread.sleep(200)
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    val heap0 = usedHeap()
    val t0 = System.nanoTime()
    cat.upsert(batch, "probe", Seq("symbol", "d"), Seq("symbol"))
    val sec = (System.nanoTime() - t0) / 1e9
    val heapDeltaMb = (usedHeap() - heap0) / 1048576.0

    val after = cat.read("probe")
    val total = after.count()
    val updated = after.filter(col("d") === 0 && col("v") === 2.0).count()
    val inserted = after.filter(col("d") === rowsPer).count()
    println(s"""{"probe":"upsert_scale","partitions":$nParts,""" +
      s""""rows_per_part":$rowsPer,"upsert_sec":${math.round(sec * 10) / 10.0},""" +
      s""""driver_heap_delta_mb":${math.round(heapDeltaMb * 10) / 10.0},""" +
      s""""rows_total":$total,"rows_updated":$updated,"rows_inserted":$inserted,""" +
      s""""expect_total":${nParts.toLong * (rowsPer + 1)},"expect_updated":$nParts,""" +
      s""""expect_inserted":$nParts}""")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(wh))
    spark.stop()
  }
}
