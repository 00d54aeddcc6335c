package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the CDC
  * primitive behind snapshot-based change feeds (what Delta's CHANGE DATA
  * FEED computes from its log, expressed engine-side as one full outer
  * join on the key).
  *
  * Output: key columns + `change_type` ∈ {added, removed, changed}, with
  * unchanged rows dropped. `changed` compares ONLY the named compare
  * columns, null-safely (`<=>`), so schema-widening columns can be
  * excluded by the caller.
  *
  * Scale notes (100 TB posture): one shuffle per side on the key columns
  * (the join), no window, no sort; at cluster scale both snapshot reads
  * are pruned to the key+compare columns (column pruning reaches the
  * scan). Keys are assumed unique per snapshot — enforce upstream with
  * the latest-per-key dedup operators; a duplicate key would fan out in
  * the join exactly as in any CDC system.
  */
object TableDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(col): _*)
    val joined = o.as("o").join(n.as("n"),
      keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _),
      "full_outer")
    val oldMissing = keyCols.map(k => col(s"o.$k").isNull).reduce(_ && _)
    val newMissing = keyCols.map(k => col(s"n.$k").isNull).reduce(_ && _)
    val same = compareCols.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val keyOut = keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val oldOut = compareCols.map(c => col(s"o.$c").as(s"old_$c"))
    val newOut = compareCols.map(c => col(s"n.$c").as(s"new_$c"))
    joined.select(keyOut ++ oldOut ++ newOut :+
        when(oldMissing, lit("added"))
          .when(newMissing, lit("removed"))
          .when(!same, lit("changed")).as("change_type"): _*)
      .filter(col("change_type").isNotNull)
  }
}
