package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Pins the physical parallelism of a frame that is about to be
  * row-multiplied (an explode / sequence-unnest / combination expansion).
  *
  * The trap — bitten twice before it was named here: q246's Poisson
  * bootstrap (a single-file scan expanded ×40 on one task, 15 s → 2 s
  * once pinned) and the co-purchase edge builder behind
  * q94/q236/q250/q254 (AQE coalesced the bytes-tiny grouped exchange to
  * ~1 partition under the ~12× combination explode, q94 6.3 → 5.1 s) —
  * is that every sizing decision below an explode is BYTES-based: the
  * file splitter and AQE's `CoalesceShufflePartitions` both see the small
  * pre-explode frame, and neither can see that the operator ABOVE
  * multiplies its rows 12–40×. The multiplied work, and any downstream
  * map-side partial aggregate fused into the same stage, then serializes
  * onto the one task the tiny input planned.
  *
  * The fix is one cheap shuffle of the SMALL pre-explode frame to an
  * explicitly pinned partition count. Explicit-N `repartition` plans a
  * `REPARTITION_BY_NUM` shuffle, which AQE's coalescer leaves alone; a
  * bare `.repartition(key)` is NOT enough — `REPARTITION_BY_COL` is a
  * coalescible origin, so AQE may fold it right back to one partition
  * (PinnedExplodeSpec demonstrates exactly that). At cluster scale the
  * pre-explode frame is large enough that the pinned exchange is cheap
  * relative to the expansion it parallelizes — the same reasoning as
  * sizing `maxPartitionBytes` for a scan.
  */
object PinnedExplode {

  /** Repartitions `df` by `keys` to the session's default parallelism
    * with the count pinned against AQE coalescing. Call directly below
    * the row-multiplying operator; keep the expansion (and whatever
    * partial aggregate follows it) in the pinned stage. */
  def pin(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty,
      "PinnedExplode.pin needs partitioning keys: a keyless round-robin " +
        "repartition would break any downstream key-local aggregation")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
  }
}
