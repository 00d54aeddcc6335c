package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums (a parallel scan) over a total order.
  *
  * The naive formulation — `sum(x) OVER (ORDER BY k)` with no PARTITION BY —
  * moves the entire relation into ONE window partition (Spark warns
  * "No Partition Defined for Window operation"), which is the canonical
  * 100 TB anti-pattern: one task sorts and scans everything. This operator
  * computes the same result with the classic two-level scan:
  *
  *   1. range-repartition by the order key, so partition p holds a
  *      contiguous key range and ranges are sorted across partitions;
  *   2. per-partition local running sums (an ordinary partitioned window);
  *   3. one tiny aggregate — per-partition totals, at most
  *      `spark.sql.shuffle.partitions` rows — turned into EXCLUSIVE prefix
  *      offsets with a window over that constant-size frame;
  *   4. broadcast the offsets back and add them to the local sums.
  *
  * Every heavy stage is fully parallel; the only global object is the
  * offsets table, whose size is the partition count, never the data.
  *
  * Determinism: callers must pass order keys that form a TOTAL order
  * (unique key tuples). Rows with equal keys could land on either side of
  * a range boundary, making their local prefix ambiguous. All in-repo
  * callers scan a grouped-by-key frame, where uniqueness holds by
  * construction. Sums are exact (LONG or DECIMAL inputs), so the result is
  * independent of where the sampler actually places the range boundaries.
  *
  * The offsets job and the final join must observe the SAME partition
  * placement (RangePartitioner samples its boundaries anew per
  * materialization), so the ranged input is localCheckpointed — lazily,
  * the offsets aggregate materializes it as a side effect of its own pass.
  *
  * Reference behavior: cumulative market stats in
  * `reference/sql/example_queries.sql` (running totals over trade dates);
  * re-expressed here without the single-partition window the reference's
  * warehouse tolerates.
  */
object DistributedScan {

  /** Adds `<c>_cum` (inclusive prefix sum) for each column in `sumCols`,
    * ordered by `orderCols`. Sum columns must be integral or decimal —
    * exactness of the two-level composition is what makes the scan
    * partitioning-invariant. */
  def prefixSums(df: DataFrame, orderCols: Seq[Column], sumCols: Seq[String]): DataFrame = {
    val bad = sumCols.map(c => c -> df.schema(c).dataType).filterNot { case (_, t) =>
      t.isInstanceOf[org.apache.spark.sql.types.LongType] ||
        t.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
        t.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    }
    require(bad.isEmpty,
      s"prefixSums needs exact (integral/decimal) sum columns; got $bad — " +
        "double sums would make the result depend on range-boundary placement")
    require(!df.columns.contains("__pid"),
      "DistributedScan.prefixSums: input already has reserved column __pid")

    // LAZY localCheckpoint: placement must be pinned — relying on exchange
    // reuse alone was tried and produced a REAL hash miss (q115 at sf0.01:
    // AQE materialized the two branches' range exchanges separately, the
    // RangePartitioner resampled, and the offsets keyed a different
    // placement than the join). Lazy (not eager) because the offsets
    // aggregate is always the first consumer: it materializes the blocks
    // while doing useful work — one pass fewer than an eager checkpoint
    // (measured q134 4.0 -> 3.3 s, q120 6.3 -> 5.3 s warm). Even before
    // any block persists, the checkpoint call plans the subtree ONCE, so
    // both branches share one shuffle id — the placement coupling holds
    // by RDD identity, not by racy exchange-reuse.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)

    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(col(c)).over(wLocal))
    }

    // Offsets frame: |partitions| rows — the tiny-table case where an
    // unpartitioned window is the RIGHT tool (cf. q112's cell table).
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("__pid"))
      .agg(sumCols.map(c => sum(col(c)).as(s"${c}_tot")).head,
        sumCols.map(c => sum(col(c)).as(s"${c}_tot")).tail: _*)
    val offsets = sumCols.foldLeft(offs) { (d, c) =>
      d.withColumn(s"${c}_off", sum(col(s"${c}_tot")).over(wOff))
    }.select(col("__pid") +: sumCols.map(c => col(s"${c}_off")): _*)

    val joined = local.join(broadcast(offsets), "__pid")
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_cum",
        col(s"${c}_cum") + coalesce(col(s"${c}_off"), lit(0L)))
    }.drop("__pid" +: sumCols.map(c => s"${c}_off"): _*)
  }

  /** Adds `out` = the global 1-based row number under `orderCols`, computed
    * as the prefix sum of a literal 1 — i.e. `row_number() OVER (ORDER BY
    * …)` without the single-partition window that formulation plans. Same
    * total-order requirement as [[prefixSums]] (unique key tuples). Used by
    * q238's bootstrap row index, where the naive global row_number was the
    * engine's last in-gate data-sized unpartitioned window. */
  def rowNumbers(df: DataFrame, orderCols: Seq[Column], out: String): DataFrame = {
    require(!df.columns.contains("__one"),
      "DistributedScan.rowNumbers: input already has reserved column __one")
    prefixSums(df.withColumn("__one", lit(1L)), orderCols, Seq("__one"))
      .withColumnRenamed("__one_cum", out)
      .drop("__one")
  }

  /** EXACT per-group quantiles (quantile_cont / `percentile` semantics:
    * linear interpolation at h = (n−1)·p) with BOUNDED per-task memory.
    *
    * Spark's exact `percentile` aggregate buffers a value→count map per
    * group: fine when the value domain is small (l_quantity's 50
    * distinct values), an OOM-at-corpus-scale and a |groups|-task
    * parallelism cap when the column is near-continuous (prices,
    * event values) and groups are few — the round-12 q102/q126/q227
    * migration. This operator gets the same numbers from the scan
    * discipline above:
    *
    *   1. one map-side-combinable (group, value) count — the same
    *      pre-shrink the aggregate does internally, but distributed;
    *   2. [[prefixSums]] over (group, value) order gives every distinct
    *      value its global rank interval (key tuples unique by
    *      construction — the total-order contract holds);
    *   3. per-group rank = global cum − the group's offset, where the
    *      offsets come from a |groups|-row frame (tiny-table window);
    *   4. each quantile's two bracketing values are picked by
    *      rank-interval containment and linearly interpolated
    *      (lower + frac·(upper − lower)).
    *
    * NULL values are skipped, matching the aggregate. A group whose
    * values are ALL null vanishes from the output (the aggregate would
    * emit a null quantile) — a caller that must surface such groups
    * left-joins from its group list (q227's arm rows do exactly that,
    * so an empty arm yields NULL quantiles, not a vanished row).
    * Quantiles are returned UNROUNDED; callers round (every gate pins
    * 6 dp before reuse so both engines see bit-identical fences).
    *
    * GROUP CARDINALITY IS UNBOUNDED: at ≤10⁴ groups the offset table
    * is the tiny-table case — an unpartitioned |groups|-row window
    * plus an explicit broadcast (the 2–5-group gates' zero-extra-
    * shuffle shape); above it the offsets are computed with
    * [[prefixSums]] itself (group keys are unique in the totals
    * frame, so the scan's
    * total-order contract holds) and the join stays shuffled — at
    * millions of per-domain groups nothing in the plan is sized by
    * |groups| on one task. GroupedQuantilesSpec proves the large-path
    * plan at 10⁵ synthetic groups.
    *
    * HOW THE PATH IS CHOSEN: `maxGroups` is a caller-asserted
    * cardinality bound, the same contract as `broadcast()` — the gates
    * that use this operator group by enum-like domains (return flags,
    * event types, experiment arms, a constant) whose bound is a data-
    * model fact, and passing it makes the whole operator a single
    * action-free plan. When the bound is unknown (`None`), the count
    * is MEASURED with one cheap aggregate over the checkpointed scan —
    * correct for any cardinality, but the dedicated decision action
    * costs a scheduling round-trip plus the lazy-checkpoint
    * materialization pass before the main job (the round-13 q102
    * driver regression, 3.2 → 4.8 s, was exactly this floor paid once
    * per invocation). An overstated `Some(n)` only misroutes to the
    * shuffled large path (perf, never correctness); an UNDERstated
    * bound on truly huge groups would broadcast a data-sized offsets
    * frame — the same failure mode as a wrong `broadcast()` hint, and
    * loud (broadcast size cap), not silent.
    *
    * @param df        input frame
    * @param group     grouping column (returned under its `out` name
    *                  `__g` — callers rename)
    * @param value     value column (numeric; cast to double)
    * @param ps        quantile fractions in [0, 1]
    * @param out       one output column name per fraction
    * @param maxGroups caller-asserted upper bound on the group
    *                  cardinality (a domain fact, e.g. 3 return
    *                  flags); `None` = measure it with one aggregate
    * @return one row per group: (`__g`, out…)
    */
  def groupedQuantiles(df0: DataFrame, group: Column, value: Column,
      ps: Seq[Double], out: Seq[String],
      maxGroups: Option[Long] = None): DataFrame = {
    require(ps.nonEmpty && ps.size == out.size,
      "groupedQuantiles: one output name per fraction")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedQuantiles: fractions must be in [0,1], got $ps")
    val df = df0.select(group.as("__g"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val vc = df.groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val cum = prefixSums(vc, Seq(col("__g"), col("__v")), Seq("__c"))
    // group totals come from the scan's own checkpointed output — no
    // second pass over the raw data. The offsets path: at small
    // cardinality the |groups|-row frame is the tiny-table case where
    // an unpartitioned window and a broadcast are the RIGHT tools
    // (routing 3-row offsets through the two-level scan and letting
    // AQE pre-shuffle the cum side cost the q102-class gates ~2 s of
    // pure job floor on the round-13 artifact); past the bound the
    // offsets go through [[prefixSums]] and the join stays shuffled —
    // nothing is ever sized by |groups| on one task. The bound check
    // is the caller's asserted domain fact when given (zero extra
    // actions — the whole operator is one plan) and a measured
    // totals.count() otherwise (see the Scaladoc for the cost of that
    // decision action).
    val totals = cum.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val smallBound = 10000L // ~1 MB of offsets: safe to broadcast
    maxGroups.foreach(n => require(n > 0,
      s"groupedQuantiles: maxGroups must be positive, got $n"))
    val smallGroups = maxGroups.getOrElse(totals.count()) <= smallBound
    val offs0 =
      if (smallGroups) {
        val wF = Window.orderBy(col("__g"))
          .rowsBetween(Window.unboundedPreceding, -1)
        totals.withColumn("__off", coalesce(sum(col("__n")).over(wF), lit(0L)))
      } else
        prefixSums(totals, Seq(col("__g")), Seq("__n"))
          .withColumn("__off", col("__n_cum") - col("__n"))
          .drop("__n_cum")
    val offs = ps.indices.foldLeft(offs0) { (d, i) =>
      d.withColumn(s"__h$i", (col("__n") - 1).cast("double") * ps(i))
        .withColumn(s"__k$i", floor(col(s"__h$i")).cast("long") + 1)
    }
    def hit(k: Column) =
      k > col("__c_cum") - col("__off") - col("__c") &&
        k <= col("__c_cum") - col("__off")
    val anyHit = ps.indices
      .map(i => hit(col(s"__k$i")) || hit(col(s"__k$i") + 1))
      .reduce(_ || _)
    val aggs = ps.indices.flatMap { i =>
      Seq(min(when(hit(col(s"__k$i")), col("__v"))).as(s"__x$i"),
        min(when(hit(col(s"__k$i") + 1), col("__v"))).as(s"__y$i"),
        first(col(s"__h$i")).as(s"__hh$i")) // constant per group
    }
    // small cardinality: explicit broadcast, so the |distinct values|
    // frame joins map-side with no exchange at all (AQE's runtime
    // broadcast decision still pre-plans — and pre-writes — the big
    // side's shuffle); large cardinality: shuffled join
    cum.join(if (smallGroups) broadcast(offs) else offs, "__g")
      .filter(anyHit)
      .groupBy(col("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__g") +: ps.indices.map { i =>
        (col(s"__x$i") + (col(s"__hh$i") - floor(col(s"__hh$i"))) *
          (coalesce(col(s"__y$i"), col(s"__x$i")) - col(s"__x$i")))
          .as(out(i))
      }: _*)
  }
}
