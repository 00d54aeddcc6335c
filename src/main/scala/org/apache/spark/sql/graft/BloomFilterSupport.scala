package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery

/** Bloom-filter join pruning: build a compact membership filter over the
  * dimension's join keys, probe it on the fact side BEFORE the join's
  * shuffle, and let the exact join remove the filter's false positives.
  *
  * This is the manual form of runtime row-level filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` injects the
  * same pair automatically for eligible shuffle joins): at 100 TB a
  * selective dimension predicate turns into a fact-side scan filter, so
  * only matching rows — not the whole fact table — pay serialization and
  * network for the exchange. The filter is a few KB of broadcast state
  * regardless of fact size; correctness never depends on it (a Bloom
  * filter has no false NEGATIVES, so pruning drops only rows the join
  * would discard anyway — which is exactly what the q87 oracle checks).
  *
  * Wraps Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the InjectRuntimeFilter kernels) rather than reimplementing the
  * sketch: probes stay codegen'd and the serialized format matches what
  * the engine's adaptive runtime filters produce.
  */
object bloom {

  /** Aggregate the (xxhash64-hashed) keys into a serialized Bloom filter
    * sized for `expectedItems` at roughly 3% false-positive rate. */
  def bloomAgg(keys: Column, expectedItems: Long): Column = {
    val numBits = math.max(64L, expectedItems * 8) // ~8 bits/item ≈ 2–3% fpp
    ColumnBridge.lift(BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.unwrap(keys))),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())
  }

  /** Probe predicate: true iff `probe`'s hash may be in the filter built
    * by `bloomDf` (a 1-row frame from [[bloomAgg]]). The filter attaches
    * as a scalar subquery, so the deserialized bitmap is cached once per
    * task, not per row. */
  def mightContain(bloomDf: DataFrame, probe: Column): Column =
    ColumnBridge.lift(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      new XxHash64(Seq(ColumnBridge.unwrap(probe)))))
}
