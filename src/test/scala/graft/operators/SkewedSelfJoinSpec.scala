package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Lossless hot-key salting for interval self-joins: pair-multiset parity
  * with the naive shuffled join on a planted hot key, cold-path purity,
  * and the shared-column contract. */
class SkewedSelfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // key 7 is HOT (120 match rows, over the test threshold of 50);
  // keys 1..10 are cold (3 match rows each)
  private lazy val anchor = (
    (1 to 40).map(i => (7L, 7000L + i, (i % 30).toLong)) ++
      (1 to 10).flatMap(k => (1 to 4).map(i => (k.toLong, k * 100L + i, (i * 7).toLong)))
    ).toDF("k", "aid", "av")
  private lazy val matchSide = (
    (1 to 120).map(i => (7L, (i % 40).toLong, i.toLong)) ++
      (1 to 10).flatMap(k => (1 to 3).map(i => (k.toLong, (i * 2).toLong, (k * 10 + i).toLong)))
    ).toDF("k", "mv", "mid")

  private def residual = $"mv" <= $"av"

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select($"k", $"aid", $"mv", $"mid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("salted join == naive join on a planted hot key (pair-multiset parity)") {
    val naive = anchor.join(
      matchSide.withColumnRenamed("k", "mk"),
      $"k" === $"mk" && residual).drop("mk")
    val salted = SkewedSelfJoin.saltedIntervalJoin(
      anchor, matchSide, "k", residual, hotThreshold = 50, salts = 4)
    val n = pairs(naive)
    val s = pairs(salted)
    assert(n.nonEmpty && n.exists(_._1 == 7L), "fixture must produce hot-key pairs")
    assert(s == n, s"salted diverged: ${s.size} vs ${n.size} pairs")
  }

  test("every hot-key pair meets in exactly one salt bucket (no dups)") {
    val salted = SkewedSelfJoin.saltedIntervalJoin(
      anchor, matchSide, "k", residual, hotThreshold = 50, salts = 4)
    val dup = salted.groupBy($"k", $"aid", $"mv", $"mid")
      .agg(count(lit(1)).as("n")).filter($"n" > 1).count()
    assert(dup == 0, s"$dup duplicated pairs")
  }

  test("cold-only input produces identical results with no hot branch rows") {
    val coldA = anchor.filter($"k" =!= 7L)
    val coldM = matchSide.filter($"k" =!= 7L)
    val naive = coldA.join(
      coldM.withColumnRenamed("k", "mk"), $"k" === $"mk" && residual).drop("mk")
    val salted = SkewedSelfJoin.saltedIntervalJoin(
      coldA, coldM, "k", residual, hotThreshold = 50, salts = 4)
    assert(pairs(salted) == pairs(naive))
  }

  test("shared non-key columns are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      SkewedSelfJoin.saltedIntervalJoin(
        anchor, anchor, "k", residual, hotThreshold = 50)
    }
    assert(e.getMessage.contains("share only the key column"), e.getMessage)
  }

  test("key-only anchor is rejected loudly (no columns to salt on)") {
    // hash() of zero children is an AnalysisException deep in planning;
    // the operator must fail earlier with a message that names the fix
    val keyOnly = anchor.select($"k")
    val e = intercept[IllegalArgumentException] {
      SkewedSelfJoin.saltedIntervalJoin(
        keyOnly, matchSide, "k", lit(true), hotThreshold = 50)
    }
    assert(e.getMessage.contains("saltCols"), e.getMessage)
  }

  test("saltCols not on the anchor are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      SkewedSelfJoin.saltedIntervalJoin(
        anchor, matchSide, "k", residual, hotThreshold = 50,
        saltCols = Seq("no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"), e.getMessage)
  }

  test("caller-supplied saltCols: parity holds and constant payloads spread") {
    // anchor whose NON-KEY payload is constant within the hot key — the
    // default salt (hash of payload) would collapse to one bucket; salting
    // on the unique row id must both stay lossless and actually spread
    val constA = (
      (1 to 40).map(i => (7L, 7000L + i, 10L)) ++ // av constant on hot key
        (1 to 10).flatMap(k => (1 to 4).map(i => (k.toLong, k * 100L + i, (i * 7).toLong)))
      ).toDF("k", "aid", "av")
    val naive = constA.join(
      matchSide.withColumnRenamed("k", "mk"), $"k" === $"mk" && residual).drop("mk")
    val salted = SkewedSelfJoin.saltedIntervalJoin(
      constA, matchSide, "k", residual, hotThreshold = 50, salts = 4,
      saltCols = Seq("aid"))
    assert(pairs(salted) == pairs(naive))
    // the row-id salt spreads the constant-payload hot key across buckets
    import org.apache.spark.sql.functions.{hash => shash}
    val buckets = constA.filter($"k" === 7L)
      .select(pmod(shash($"aid"), lit(4)).as("b"))
      .distinct().count()
    assert(buckets > 1, "row-id salt should occupy more than one bucket")
  }
}
