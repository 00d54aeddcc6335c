package graft.streaming

import graft.dedup.Dedup
import graft.pipeline.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming corpus dedup: maintain the connected-component labeling of a
  * similarity-pair stream across micro-batches.
  *
  * Each micro-batch of new candidate pairs merges into the persisted
  * labeling via [[Dedup.incrementalComponents]] — cost |state| + |batch|,
  * never a recompute over the historical pair graph — and the updated
  * labels land through the catalog's crash-safe staged swap (the merge
  * READS the state table it replaces, so an in-place overwrite would eat
  * its own input; the upsert path stages first). A crash between batches
  * replays the batch against the last committed state: labels only ever
  * decrease toward the component minimum, so replay is idempotent.
  *
  * At 100 TB this is the arrival-time form of dedup: candidate pairs are
  * mined for NEW documents only (new x new, plus new x old via the band
  * index), and group resolution stays proportional to the day's batch,
  * not the corpus.
  */
object StreamingComponents {

  /** foreachBatch sink maintaining `table` as the (`__id`, `__lbl`)
    * labeling of everything seen so far. */
  def labelSink(cat: Catalog, table: String, aCol: String, bCol: String)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    if (!batch.isEmpty) {
      val merged =
        if (cat.exists(table))
          Dedup.incrementalComponents(
            cat.read(table).select(col("__id"), col("__lbl")),
            batch, aCol, bCol)
        else Dedup.connectedComponents(batch, aCol, bCol)
      cat.upsert(merged, table, keys = Seq("__id"), partitionBy = Nil)
    }
  }
}
