package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Handchecks for q218 (containment dedup): token-aligned semantics and
  * the rarest-shingle candidate step's losslessness on multi-container
  * cases. */
class ContainmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("containment")
    Seq(
      (1L, "x y z w v", "en", "s0", 9L),
      (2L, "a x y z w v b", "en", "s0", 13L),   // contains doc 1
      (3L, "p x y z w v", "en", "s0", 11L),     // also contains doc 1
      // "art ord pick ..." appears inside doc 5 only MID-WORD (after the
      // 'p' of "part") — token alignment must reject it
      (4L, "art ord pick aaa bbb", "en", "s1", 20L),
      (5L, "part ord pick aaa bbb", "en", "s1", 21L),
      // short docs (<3 tokens) have no shingles — the rarest-token
      // candidate path must still find them inside containers
      (6L, "z w", "en", "s2", 3L),                    // inside docs 1,2,3
      (7L, "qq", "en", "s2", 2L),                     // inside doc 8 only
      (8L, "zz qq yy", "en", "s2", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q218: containment found in every container; mid-word match rejected") {
    val got = SparkEntry.queries("q218_containment_dedup")(spark, fixtures)
      .collect()
      .map(r => (r.getAs[Long]("contained_doc"), r.getAs[Long]("container_doc")))
      .toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (6L, 1L), (6L, 2L), (6L, 3L),
      (7L, 8L)), s"got $got")
  }

  test("q218 candidates join on one rarest-shingle key per doc (no n² text scan)") {
    val plan = SparkEntry.queries("q218_containment_dedup")(spark, fixtures)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment candidates must never go all-pairs:\n$plan")
  }
}
