package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lossless hot-key salting for equi+residual (interval/range) self-joins.
  *
  * The shuffled interval self-join (q11's trailing-window shape, the
  * reference's `sql/example_queries.sql:137-149` self interval join on
  * `symbol`) shuffles both sides on the equi key: ONE hot key — a symbol
  * carrying a third of the tape is normal in market data — lands its whole
  * key group in one task whose residual-match work is quadratic in the
  * group size. AQE's skew-join split does not save it: `OptimizeSkewedJoin`
  * splits oversized PARTITIONS of a sort-merge join, but all rows of one
  * key hash to one partition-side pair and the split cannot separate them
  * without replicating the other side, which AQE only does for pure equi
  * conditions it can prove.
  *
  * Unlike the LSH banded joins (where [[graft.dedup.Dedup]]'s guard must
  * REFUSE because salting drops cross-salt candidate pairs), an interval
  * self-join salts LOSSLESSLY: split the anchor side of a hot key into `S`
  * hash buckets and replicate the match side of that key into each bucket —
  * every qualifying (anchor, match) pair then meets in exactly one bucket,
  * so the result multiset is identical and only the parallelism changes
  * (hot key group cost falls from O(n·m) in one task to O(n·m/S) across S
  * tasks; replication adds (S−1)·m match rows for hot keys only).
  *
  * The hot-key probe is IN-PLAN (a grouped count filtered to keys over the
  * threshold, broadcast back onto both sides): no driver action, no extra
  * job, and the count aggregate shuffles on the same key as the cold-path
  * join so the exchange is reusable. The hot-key set is bounded by
  * |matchSide| / hotThreshold rows — broadcastable by construction.
  *
  * Contract: `anchor` and `matchSide` must share ONLY the key column name
  * (rename the rest apart — the residual condition then references columns
  * unambiguously). Deterministic: the salt is a hash of the anchor row's
  * non-key columns (or `saltCols` when supplied), not a random number.
  *
  * Salt-balance caveat: because the salt is derived from anchor column
  * VALUES, its balance depends on those values' cardinality WITHIN a hot
  * key — if a hot key's anchor rows carry identical non-key values they
  * all hash to one bucket and the quadratic task quietly returns (results
  * stay correct; only the mitigation is defeated). Callers whose anchor
  * payload can be constant per key must pass a high-cardinality column
  * (a row id, an event timestamp) via `saltCols`. An anchor with ZERO
  * non-key columns is rejected loudly (Spark's `hash()` of no children is
  * an AnalysisException at runtime; we fail earlier with a usable message).
  */
object SkewedSelfJoin {

  /** Number of salt buckets a hot key's anchor rows are split into. */
  val DefaultSalts: Int = 16

  def saltedIntervalJoin(
      anchor: DataFrame,
      matchSide: DataFrame,
      key: String,
      residual: Column,
      hotThreshold: Long,
      salts: Int = DefaultSalts,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(hotThreshold > 0, s"hotThreshold must be > 0, got $hotThreshold")
    val overlap = anchor.columns.toSet.intersect(matchSide.columns.toSet)
    require(overlap == Set(key),
      s"anchor and matchSide must share only the key column '$key'; " +
        s"shared: ${overlap.mkString(", ")}")
    val saltSource =
      if (saltCols.nonEmpty) saltCols else anchor.columns.toSeq.filterNot(_ == key)
    require(saltSource.nonEmpty,
      "anchor has no non-key columns to derive the deterministic salt from; " +
        "pass saltCols with a high-cardinality column (e.g. a row id)")
    val missing = saltSource.filterNot(anchor.columns.contains)
    require(missing.isEmpty,
      s"saltCols not present on anchor: ${missing.mkString(", ")}")

    // in-plan probe: keys whose MATCH side exceeds the threshold (the match
    // side is what gets replicated/scanned per anchor row, so its size is
    // what makes a key group quadratic)
    val hot = matchSide.groupBy(col(key)).agg(count(lit(1)).as("__kn"))
      .filter(col("__kn") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))

    val aMarked = anchor.join(broadcast(hot), Seq(key), "left")
    val mMarked = matchSide.join(broadcast(hot), Seq(key), "left")

    // self-join on the shared key column name: disambiguate by renaming the
    // match side's key and joining on equality, then dropping the copy
    val mKey = s"__${key}_m"
    def joinOn(a: DataFrame, m: DataFrame, saltKeys: Boolean): DataFrame = {
      val mr = m.withColumnRenamed(key, mKey)
      val eq =
        if (saltKeys) col(key) === col(mKey) && col("__a_salt") === col("__m_salt")
        else col(key) === col(mKey)
      a.join(mr, eq && residual, "inner").drop(mKey)
    }

    val coldJoined = joinOn(
      aMarked.filter(col("__hot").isNull).drop("__hot"),
      mMarked.filter(col("__hot").isNull).drop("__hot"),
      saltKeys = false)

    val hotJoined = joinOn(
      aMarked.filter(col("__hot") === true).drop("__hot")
        .withColumn("__a_salt",
          pmod(hash(saltSource.map(col): _*), lit(salts))),
      mMarked.filter(col("__hot") === true).drop("__hot")
        .withColumn("__m_salt",
          explode(sequence(lit(0), lit(salts - 1)))),
      saltKeys = true).drop("__a_salt", "__m_salt")

    coldJoined.unionByName(hotJoined)
  }
}
