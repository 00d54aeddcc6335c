package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[PinnedExplode]] — the named form of the AQE over-coalesce fix that
  * was previously two ad-hoc comments (q246's scan, the co-purchase edge
  * builder). Two things are pinned here: the TRAP is real in this exact
  * runtime (a bare repartition-by-col under AQE folds a bytes-tiny frame
  * onto ~1 partition, serializing the explode), and the operator holds
  * the explode stage at the session's full default parallelism. Partition
  * occupancy is observed with `spark_partition_id()` taken directly above
  * the explode — narrow, so it reads the exchange the explode actually
  * ran in. */
class PinnedExplodeSpec extends SparkTestBase {
  import spark.implicits._

  // bytes-tiny frame (10k keys, one int payload) under a ×20 explode
  private def base = spark.range(10000)
    .select($"id".as("k"), sequence(lit(1), lit(20)).as("arr"))

  private def partitionsUsed(df: org.apache.spark.sql.DataFrame): Long =
    df.select(spark_partition_id().as("p"), explode($"arr").as("x"))
      .select($"p").distinct().count()

  test("the trap exists: bare repartition(key) is AQE-coalesced under the explode") {
    assume(spark.conf.get("spark.sql.adaptive.enabled") == "true" &&
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    val folded = partitionsUsed(base.repartition($"k"))
    assert(folded < spark.sparkContext.defaultParallelism,
      s"expected AQE to fold the tiny REPARTITION_BY_COL exchange, ran on $folded")
  }

  test("pin holds the explode stage at default parallelism") {
    val pinned = partitionsUsed(PinnedExplode.pin(base, $"k"))
    assert(pinned == spark.sparkContext.defaultParallelism,
      s"pinned explode ran on $pinned of ${spark.sparkContext.defaultParallelism}")
  }

  test("pin refuses keyless use") {
    intercept[IllegalArgumentException] { PinnedExplode.pin(base) }
  }
}
