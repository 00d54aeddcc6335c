package graft.dedup

import graft.SparkTestBase
import scala.util.Random

/** Incremental component maintenance must equal a full recompute: for a
  * random pair graph split into an initial batch and an increment,
  * CC(all) == incremental(CC(initial), increment) — including min-id
  * labels, singleton preservation, and ids that only appear in the
  * increment. */
class IncrementalCcSpec extends SparkTestBase {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental merge equals full recompute on random graphs") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val (first, second) = pairs.splitAt(pairs.length / 2)
      val full = Dedup.connectedComponents(
        pairs.toDF("a", "b"), "a", "b")
      val state = Dedup.connectedComponents(
        first.toDF("a", "b"), "a", "b")
      val merged = Dedup.incrementalComponents(
        state, second.toDF("a", "b"), "a", "b")
      val fullM = labelsOf(full)
      val mergedM = labelsOf(merged)
      assert(mergedM == fullM,
        s"trial $trial: incremental labeling diverged from full recompute " +
          s"(diff: ${(mergedM.toSet diff fullM.toSet).take(5)})")
    }
  }

  test("state-only singletons survive the merge untouched") {
    import spark.implicits._
    // component {1,2} in the state; the increment only concerns {10,11}
    val state = Dedup.connectedComponents(Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    val merged = Dedup.incrementalComponents(
      state, Seq((10L, 11L)).toDF("a", "b"), "a", "b")
    assert(labelsOf(merged) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
