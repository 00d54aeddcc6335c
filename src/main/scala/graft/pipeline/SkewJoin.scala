package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime, but it only splits
  * oversized SHUFFLE partitions of sort-merge joins; a pathological hot key
  * inside one task still serializes. Salting fixes the layout: the big side
  * scatters each key across `salt` sub-keys (deterministically, from a hash
  * of the row, so re-runs are stable), the small side replicates each key
  * `salt` times, and the join key becomes (key, salt). Fan-out cost is
  * salt× the small side — use for dimension-vs-skewed-fact shapes.
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) && saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop(saltedSmall(key))
      .drop("__salt")
  }
}
