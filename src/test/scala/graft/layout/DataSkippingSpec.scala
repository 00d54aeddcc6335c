package graft.layout

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[DataSkipping]]: pruning must actually skip files on a clustered
  * layout, and must never change results. */
class DataSkippingSpec extends SparkTestBase {

  private def ts(s: String) = lit(Timestamp.valueOf(s))

  test("range scan over clustered files prunes most files, same rows as full filter") {
    val dir = tmpDir("skip") + "/li"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartitionByRange(12, col("l_shipdate"))
      .write.parquet(dir)
    val stats = DataSkipping.fileStats(spark, dir, Seq("l_shipdate"))
    val total = stats.count()
    assert(total >= 10, s"expected a multi-file layout, got $total")

    val (lo, hi) = (ts("2001-01-01 00:00:00"), ts("2001-06-30 00:00:00"))
    val files = DataSkipping.candidateFiles(stats, "l_shipdate", lo, hi)
    // a 6-month window out of ~7 years must hit a small minority of
    // range-clustered files (boundary files may straddle: allow a few)
    assert(files.nonEmpty && files.size <= 3,
      s"expected <=3 of $total files, got ${files.size}")

    val pruned = DataSkipping.readPruned(spark, stats, "l_shipdate", lo, hi)
    val full = spark.read.parquet(dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") <= hi)
    assert(pruned.count() === full.count())
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("a window beyond every file's range prunes everything, schema intact") {
    val dir = tmpDir("skip-all") + "/li"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartitionByRange(4, col("l_shipdate"))
      .write.parquet(dir)
    val stats = DataSkipping.fileStats(spark, dir, Seq("l_shipdate"))
    val (lo, hi) = (ts("2030-01-01 00:00:00"), ts("2030-12-31 00:00:00"))
    assert(DataSkipping.candidateFiles(stats, "l_shipdate", lo, hi).isEmpty)
    val out = DataSkipping.readPruned(spark, stats, "l_shipdate", lo, hi)
    assert(out.isEmpty)
    assert(out.columns.contains("l_shipdate") && out.columns.contains("l_orderkey"))
  }
}
