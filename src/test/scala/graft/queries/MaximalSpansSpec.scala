package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** q338 (maximal repeated spans): apriori extension must find exactly the
  * right-maximal frequent spans a brute-force enumerator finds, with cap
  * rows reported as frequent-at-cap. */
class MaximalSpansSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Seq[(Long, String, Long, Long, Long)] = {
    val dir = tmpDir("maxspans")
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q338_maximal_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  /** Brute force: enumerate ALL k-spans for k in 4..7, count, filter
    * frequent; right-maximal for k < 7 = no frequent (k+1)-span has this
    * span as its k-token prefix; k = 7 rows are all frequent 7-spans. */
  private def ref(docs: Seq[(Long, String)]): Seq[(Long, String, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    def spans(k: Int) = (for {
      (id, w) <- toks
      i <- 0 to w.length - k
    } yield (w.slice(i, i + k).mkString(" "), id)).groupBy(_._1)
      .collect { case (sp, os) if os.size >= 3 =>
        sp -> (os.size.toLong, os.map(_._2).distinct.size.toLong, os.map(_._2).min)
      }.toMap
    val byK = (4 to 7).map(k => k -> spans(k)).toMap
    (4 to 7).flatMap { k =>
      byK(k).collect {
        case (sp, (nOcc, nDocs, first))
            if k == 7 || !byK(k + 1).keys.exists(_.startsWith(sp + " ")) =>
          (k.toLong, sp, nOcc, nDocs, first)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("handcheck: a 5-token repeat masks its two 4-token sub-spans") {
    // "a b c d e" occurs 3x -> its 4-sub-spans "a b c d"/"b c d e" are
    // frequent but NOT right-maximal ("a b c d" extends); "b c d e" IS
    // right-maximal (no frequent 5-span starts with it)
    val docs = Seq(
      1L -> "a b c d e x",
      2L -> "y a b c d e",
      3L -> "a b c d e")
    val got = run(docs)
    assert(got == Seq(
      (4L, "b c d e", 3L, 3L, 1L),
      (5L, "a b c d e", 3L, 3L, 1L)), s"got $got")
    assert(got == ref(docs))
  }

  test("handcheck: a span frequent at the 7 cap is reported at the cap") {
    val docs = Seq(
      1L -> "p q r s t u v w",
      2L -> "p q r s t u v",
      3L -> "p q r s t u v z")
    val got = run(docs)
    // PREFIX sub-spans of the 7-repeat all extend frequently (masked);
    // each SUFFIX sub-span is right-maximal (its right-extensions differ
    // across docs), and the 7-span itself is reported at the cap
    assert(got == Seq(
      (4L, "s t u v", 3L, 3L, 1L),
      (5L, "r s t u v", 3L, 3L, 1L),
      (6L, "q r s t u v", 3L, 3L, 1L),
      (7L, "p q r s t u v", 3L, 3L, 1L)), s"got $got")
    assert(got == ref(docs))
  }

  test("property: apriori extension == brute-force enumeration") {
    val genDoc = Gen.choose(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString(" ")))
    val genCorpus = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t })
    val prop = Prop.forAll(genCorpus) { corpus =>
      run(corpus) == ref(corpus)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("q338 plan: extension rounds stay keyed — no all-pairs fallback") {
    val dir = tmpDir("maxspans_plan")
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "a b c d e")
    docs.map { case (id, x) => (id, x, "en", "s0", x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = graft.SparkEntry.queries("q338_maximal_spans")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"apriori extension must never go all-pairs:\n$plan")
  }
}
