package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** The Bloom-pruned join must (a) place the probe on the fact side ahead
  * of the join and (b) actually prune: few false positives beyond the true
  * matches, never a false negative. */
class BloomJoinSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q87 plans the bloom probe as a fact-side filter under the join") {
    val p = SparkEntry.queries("q87_bloom_pruned_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom probe missing from plan:\n$p")
    // the probe must sit in a Filter, not be rewritten into the join cond
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("might_contain")),
      s"might_contain not in a standalone Filter:\n$p")
  }

  test("bloom pruning keeps every true match and few false positives") {
    import spark.implicits._
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .filter($"c_acctbal" < 0)
      .select($"c_custkey".as("user_id"))
    val bloomDf = dim.agg(
      graft.functions.bloom.bloomAgg($"user_id", 65536L).as("bf"))
    val fact = spark.read.parquet(s"$dir/events.parquet").select($"user_id")
    val pruned = fact.filter(
      graft.functions.bloom.mightContain(bloomDf, $"user_id"))
    val trueMatches = fact.join(dim, Seq("user_id"), "left_semi").count()
    val prunedCount = pruned.count()
    val total = fact.count()
    // no false negatives: every row the join keeps survives the filter
    assert(prunedCount >= trueMatches,
      s"bloom dropped true matches: $prunedCount < $trueMatches")
    // real pruning: the filter must remove most non-matching rows
    assert(prunedCount <= trueMatches + (total - trueMatches) / 10,
      s"bloom barely pruned: $prunedCount of $total (true: $trueMatches)")
  }
}
