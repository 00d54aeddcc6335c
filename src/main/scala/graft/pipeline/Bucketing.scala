package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of fact-to-fact joins (lineitem ⋈ orders,
  * bronze ⋈ incoming batch) is the exchange. Writing both sides bucketed by
  * the join key with the same bucket count makes the join a zip of
  * corresponding buckets: Catalyst plans SortMergeJoin with NO Exchange on
  * either side (bucket files are already hash-partitioned and sorted).
  * This is the parquet-table analog of the reference's Delta partitioning
  * strategy, applied to join keys rather than scan pruning.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `sortCols` should be
    * the join/sort key so bucket files are merge-join ready. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
