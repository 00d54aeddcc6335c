package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The distributed prefix sum must equal the single-partition window's
  * answer for ANY partition count, and must never itself plan an
  * unpartitioned window over the data (that being its entire reason to
  * exist). */
class DistributedScanSpec extends SparkTestBase {
  import spark.implicits._

  test("prefixSums matches the global-window answer on unique keys") {
    val df = (1 to 997).map(i => (i * 7 % 997, (i % 13).toLong, (i % 5).toLong))
      .toDF("k", "a", "b") // k is a permutation of 0..996: unique, shuffled
    val got = DistributedScan.prefixSums(df, Seq(col("k")), Seq("a", "b"))
      .orderBy($"k").select($"k", $"a_cum", $"b_cum").collect()

    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.select($"k", sum($"a").over(w).as("a_cum"),
        sum($"b").over(w).as("b_cum"))
      .orderBy($"k").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("prefixSums result is invariant to input partitioning") {
    val base = (1 to 500).map(i => (i.toLong, i.toLong % 17)).toDF("k", "a")
    val r1 = DistributedScan.prefixSums(base.repartition(1), Seq(col("k")), Seq("a"))
      .orderBy($"k").select($"k", $"a_cum").collect().toSeq
    val r7 = DistributedScan.prefixSums(base.repartition(7, $"a"), Seq(col("k")), Seq("a"))
      .orderBy($"k").select($"k", $"a_cum").collect().toSeq
    assert(r1 == r7)
  }

  test("prefixSums is correct with AQE off (static ReuseExchange path)") {
    // placement consistency between the offsets branch and the join relies
    // on the range exchange materializing ONCE; AQE does it via the stage
    // cache, the static planner via ReuseExchange — both must hold
    val df = (1 to 997).map(i => (i * 13 % 997, (i % 11).toLong)).toDF("k", "a")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.select($"k", sum($"a").over(w).as("a_cum"))
      .orderBy($"k").collect().toSeq
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = DistributedScan.prefixSums(df, Seq(col("k")), Seq("a"))
        .orderBy($"k").select($"k", $"a_cum").collect().toSeq
      assert(got == want)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("prefixSums refuses double sum columns") {
    val df = Seq((1L, 1.5)).toDF("k", "x")
    val e = intercept[IllegalArgumentException] {
      DistributedScan.prefixSums(df, Seq(col("k")), Seq("x"))
    }
    assert(e.getMessage.contains("exact"))
  }

  test("reserved helper columns are rejected, not silently clobbered") {
    val withOne = Seq((1L, 2L)).toDF("k", "__one")
    val e1 = intercept[IllegalArgumentException] {
      DistributedScan.rowNumbers(withOne, Seq(col("k")), "rn")
    }
    assert(e1.getMessage.contains("__one"))
    val withPid = Seq((1L, 2L)).toDF("k", "__pid")
    val e2 = intercept[IllegalArgumentException] {
      DistributedScan.prefixSums(withPid, Seq(col("k")), Seq("k"))
    }
    assert(e2.getMessage.contains("__pid"))
  }

  test("no unpartitioned window touches the data-sized frame") {
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("k", "a")
    val plan = DistributedScan.prefixSums(df, Seq(col("k")), Seq("a"))
      .queryExecution.optimizedPlan
    // Every Window over the scanned data must partition by __pid; the only
    // partition-less Window allowed is the offsets scan, whose input is an
    // Aggregate (the per-partition totals — |partitions| rows, not data).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    plan.foreach {
      case w: LW if w.partitionSpec.isEmpty =>
        def isAggChild(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
          p.isInstanceOf[Aggregate] || (p.children.size == 1 && isAggChild(p.children.head))
        assert(isAggChild(w.child),
          s"unpartitioned Window over non-aggregate input:\n$w")
      case _ =>
    }
  }
}
