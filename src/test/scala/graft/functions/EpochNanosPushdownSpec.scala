package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** [[org.apache.spark.sql.graft.EpochNanosPredicatePushdown]] — the rule
  * that transposes comparisons on the derived epoch-ns long `ts` back onto
  * the raw timestamp column so they reach the parquet scan.
  *
  * Two claims, tested separately:
  *   1. the plan claim — a ts range predicate appears in `PushedFilters`
  *      (without the rule it degrades to IsNotNull only);
  *   2. the value claim — the transposition is EXACT on the µs lattice,
  *      including literals that are not multiples of 1000, where the
  *      floor/ceil choice per operator is what keeps boundary rows right.
  */
class EpochNanosPushdownSpec extends SparkTestBase {
  import spark.implicits._

  // events.parquet with timestamp_ntz ts at micros 1_000_000 ± small
  // offsets, so ns literals can land between lattice points
  private lazy val dir: String = {
    val d = tmpDir("nspush")
    val micros = Seq(999999L, 1000000L, 1000001L, 1000002L, 2000000L)
    micros.toDF("m")
      .select(timestamp_micros($"m").cast("timestamp_ntz").as("ts"), $"m")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ev = Tables.events(spark, dir) // long-ns view + rule registered

  test("ts range predicate reaches the parquet scan as a pushed filter") {
    val plan = ev.filter($"ts" >= 1000000L * 1000L && $"ts" < 2000000L * 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    val pushed = plan.linesIterator.find(_.contains("PushedFilters:")).get
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThan(ts,"), pushed)
  }

  test("transposition is exact for literals off the microsecond lattice") {
    val micros = ev.select($"m").as[Long].collect().sorted
    // ns literals straddling lattice points: exact multiples and ±1
    val literals = Seq(999999000L, 999999001L, 1000000000L - 1L, 1000000000L,
      1000000001L, 1000001999L, 1000002000L, 2000000000L)
    for (k <- literals) {
      def got(c: org.apache.spark.sql.Column): Seq[Long] =
        ev.filter(c).select($"m").as[Long].collect().sorted.toSeq
      assert(got($"ts" < k) == micros.filter(_ * 1000L < k).toSeq, s"< $k")
      assert(got($"ts" <= k) == micros.filter(_ * 1000L <= k).toSeq, s"<= $k")
      assert(got($"ts" > k) == micros.filter(_ * 1000L > k).toSeq, s"> $k")
      assert(got($"ts" >= k) == micros.filter(_ * 1000L >= k).toSeq, s">= $k")
      assert(got($"ts" === k) == micros.filter(_ * 1000L == k).toSeq, s"= $k")
      // literal-on-left orientation
      assert(got(lit(k) > $"ts") == micros.filter(_ * 1000L < k).toSeq, s"$k >")
      assert(got(lit(k) <= $"ts") == micros.filter(_ * 1000L >= k).toSeq, s"$k <=")
    }
  }

  test("NULL timestamps stay NULL through the transposed comparison") {
    val d = tmpDir("nspushnull")
    Seq(Some(1000000L), None).toDF("m")
      .select(timestamp_micros($"m").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val e = Tables.events(spark, d)
    // filter drops the NULL row under either form; IS NULL still sees it
    assert(e.filter($"ts" < 2000000000L).count() == 1)
    assert(e.filter($"ts".isNull).count() == 1)
  }
}
