package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GlobalScanRewrite

/** The opt-in optimizer rule must rewrite unpartitioned running LONG sums
  * into the two-level scan (range exchange + offsets join), leave every
  * other window shape alone, and — above all — return exactly the answer
  * the single-partition window returns. */
class GlobalScanRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val FLAG = "spark.graft.rewrite.globalScan"

  private def withRule[T](on: Boolean)(body: => T): T = {
    val had = spark.experimental.extraOptimizations
    if (!had.contains(GlobalScanRewrite))
      spark.experimental.extraOptimizations = had :+ GlobalScanRewrite
    spark.conf.set(FLAG, on.toString)
    try body finally {
      spark.conf.set(FLAG, "false")
      spark.experimental.extraOptimizations = had
    }
  }

  private def base: DataFrame =
    (1 to 10000).map(i => (i * 37 % 10007, (i % 101).toLong, (i % 7).toLong))
      .toDF("k", "a", "b").repartition(13) // k: unique, shuffled; 13 input parts

  private def runningSums(df: DataFrame): DataFrame = {
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select($"k", sum($"a").over(w).as("ca"), sum($"b").over(w).as("cb"))
  }

  test("rewritten plan: range exchange in, single-partition window out") {
    withRule(on = true) {
      val plan = runningSums(base).queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{RepartitionByExpression, Window => LW}
      assert(plan.collect { case r: RepartitionByExpression => r }.nonEmpty,
        "expected a range repartition in the rewritten plan")
      val badWindows = plan.collect {
        case w: LW if w.partitionSpec.isEmpty &&
          w.windowExpressions.exists(_.toString.contains("unboundedpreceding$(), currentrow$()")) => w
      }
      assert(badWindows.isEmpty,
        s"running-frame unpartitioned Window survived the rewrite:\n$badWindows")
    }
  }

  test("rewrite returns exactly the single-partition answer (AQE on)") {
    val want = runningSums(base).orderBy($"k").collect().toSeq
    val got = withRule(on = true) {
      runningSums(base).orderBy($"k").collect().toSeq
    }
    assert(got == want)
  }

  test("flag off: plan untouched") {
    withRule(on = false) {
      val plan = runningSums(base).queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
      assert(plan.collect { case r: RepartitionByExpression => r }.isEmpty)
    }
  }

  test("non-qualifying shapes are left alone") {
    withRule(on = true) {
      import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
      // partitioned window: not the anti-pattern
      val wp = Window.partitionBy($"b").orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p1 = base.select(sum($"a").over(wp).as("s")).queryExecution.optimizedPlan
      assert(p1.collect { case r: RepartitionByExpression => r }.isEmpty)
      // non-SUM aggregate: the rewrite's offset composition only holds for sums
      val wg = Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p2 = base.select(max($"a").over(wg).as("m")).queryExecution.optimizedPlan
      assert(p2.collect { case r: RepartitionByExpression => r }.isEmpty)
      // double input: exactness contract excludes it
      val p3 = base.select(sum($"a".cast("double")).over(wg).as("s"))
        .queryExecution.optimizedPlan
      assert(p3.collect { case r: RepartitionByExpression => r }.isEmpty)
    }
  }

  test("the q133 gate query actually takes the rewrite") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    val df = graft.SparkEntry.queries("q133_running_total")(
      spark, "/root/testdata/sf0.001")
    try {
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case r: RepartitionByExpression => r }.nonEmpty,
        "q133 must execute through the distributed-scan rewrite")
    } finally spark.conf.set(FLAG, "false") // q133 turns it on session-wide
  }

  test("downstream operators keep resolving the rewritten columns") {
    withRule(on = true) {
      // filter + arithmetic above the window exercises the preserved exprIds
      val out = runningSums(base)
        .filter($"ca" > 100L)
        .select(($"ca" + $"cb").as("t"))
        .agg(sum($"t")).collect()(0).getLong(0)
      val want = withRule(on = false) {
        runningSums(base)
          .filter($"ca" > 100L)
          .select(($"ca" + $"cb").as("t"))
          .agg(sum($"t")).collect()(0).getLong(0)
      }
      assert(out == want)
    }
  }
}
