package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom broadcast interval join: plans via IntervalJoinStrategy, matches
  * the built-in BroadcastNestedLoopJoin result exactly. */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.SparkTestBase.session
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    s.experimental.extraStrategies =
      Seq(org.apache.spark.sql.graft.IntervalJoinStrategy(s))
    s
  }

  private def fixtures = {
    import spark.implicits._
    val points = ((1 to 2000).map(i => (i.toLong, i * 0.01)) :+ (9999L, 1e9))
      .toDF("id", "p")
    // overlapping + nested + disjoint intervals, plus one catch-all
    val intervals = Seq(
      (1L, 0.0, 5.0), (2L, 3.0, 8.0), (3L, 4.0, 4.5),
      (4L, 10.0, 12.0), (5L, -100.0, 100.0))
      .toDF("iv", "lo", "hi")
    (points, intervals)
  }

  test("fires on the point-in-interval pattern and matches the built-in join") {
    import spark.implicits._
    val (points, intervals) = fixtures
    val joined = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")

    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastIntervalJoin"), s"strategy did not fire:\n$plan")

    // reference result from the built-in plan (strategy disabled)
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    val expected =
      try points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
        .orderBy($"id", $"iv").collect().toSeq
      finally spark.experimental.extraStrategies = prev

    val got = joined.orderBy($"id", $"iv").collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("BETWEEN syntax and null points are handled") {
    import spark.implicits._
    val (_, intervals) = fixtures
    val withNull = Seq((1L, Some(4.2)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "p")
    val out = withNull.join(intervals, $"p".between($"lo", $"hi"))
      .select($"id", $"iv").orderBy($"id", $"iv").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // p=4.2 → intervals 1,2,3,5; p=null → none; p=50 → interval 5
    assert(out.toSeq == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("null interval bounds match nothing (not the interval [0,0])") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 3.0)).toDF("id", "p")
    val intervals = Seq(
      (1L, None, Some(5.0)),          // null lo: BETWEEN is NULL for all p
      (2L, Some(1.0), None),          // null hi: same
      (3L, Some(-1.0), Some(1.0)))    // real interval containing 0.0
      .toDF("iv", "lo", "hi")
      .select($"iv", $"lo".cast("double"), $"hi".cast("double"))
    val joined = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastIntervalJoin"))
    val got = joined.select($"id", $"iv").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L)))
  }

  test("planning/explain does not execute the right side") {
    import spark.implicits._
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    val (points, intervals) = fixtures
    val joined = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = joined.queryExecution.executedPlan // full physical planning
      assert(plan.toString.contains("BroadcastIntervalJoin"))
      Thread.sleep(500) // listener bus is async; planning-time jobs land fast
      assert(jobs == 0, s"planning ran $jobs job(s); right side must collect lazily")
      assert(joined.count() > 0) // execution still works after deferred collect
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("does not hijack equi joins or non-range conditions") {
    import spark.implicits._
    val (points, intervals) = fixtures
    val equi = points.join(intervals, $"id" === $"iv")
    assert(!equi.queryExecution.executedPlan.toString().contains("BroadcastIntervalJoin"))
  }
}
