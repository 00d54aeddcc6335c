package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping.
  *
  * A table range-partitioned and sorted on ONE column prunes scans only on
  * that column; interleaving the bits of several columns into one Z-value
  * and laying the data out in Z-order gives every interleaved column
  * locality at once — each file covers a small rectangle of the key space,
  * so min/max footer stats prune most files for range predicates on ANY of
  * the clustered columns (the property q80_zorder_layout measures).
  *
  * The caller maps each clustering column into `[0, 2^bits)` first
  * (modulo for integral ids, width-bucketing for continuous values) — the
  * interleave itself is pure integral arithmetic, stays inside
  * whole-stage codegen, and never shuffles. `cluster` adds the single
  * range exchange that the physical layout requires; `write` seals the
  * layout into parquet files whose footers carry the tight per-file
  * min/max ranges.
  */
object ZOrder {

  /** Bit-interleave of `cols` (each already in `[0, 2^bits)`): bit `i` of
    * column `j` lands at output position `i * n + j`, most-significant
    * bits first across all columns — the standard Morton code. */
  def zValue(cols: Seq[Column], bits: Int = 8): Column = {
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds a long")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Repartition by Z-value range and sort each partition by it — the
    * write-side layout step. `numFiles` bounds output file count; row
    * content is untouched (the added Z column is dropped). */
  def cluster(df: DataFrame, cols: Seq[Column], numFiles: Int,
              bits: Int = 8): DataFrame = {
    val z = zValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Cluster and seal to parquet: each output file covers a contiguous
    * Z-range, i.e. a tight rectangle of the clustered key space. */
  def write(df: DataFrame, cols: Seq[Column], numFiles: Int,
            path: String, bits: Int = 8): Unit =
    cluster(df, cols, numFiles, bits)
      .write.mode("overwrite").parquet(path)
}
