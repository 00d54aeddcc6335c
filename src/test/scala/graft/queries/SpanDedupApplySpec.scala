package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** q335 (span-dedup apply): cut/keep must PARTITION every doc's tokens,
  * each frequent span must retain exactly its first (min doc_id, start)
  * occurrence, and the whole operator must equal a plain-Scala reference
  * on random corpora. */
class SpanDedupApplySpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, String)] = {
    val dir = tmpDir("spandedup")
    writeDocs(dir, docs)
    SparkEntry.queries("q335_span_dedup_apply")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
  }

  /** Reference: mine frequent 4-spans (>= 3 occurrences, multiplicity
    * kept), keep each span's first (doc_id, start) occurrence, cut every
    * token covered by any other occurrence. */
  private def ref(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }.toMap
    val occ = for {
      (id, w) <- toks.toSeq
      i <- 0 to w.length - 4
    } yield (w.slice(i, i + 4).mkString(" "), id, i)
    val frequent = occ.groupBy(_._1).filter(_._2.size >= 3).keySet
    val firstOf = occ.filter(o => frequent(o._1)).groupBy(_._1)
      .map { case (sp, os) => sp -> os.map(o => (o._2, o._3)).min }
    val cut: Map[Long, Set[Int]] = occ
      .filter(o => frequent(o._1) && (o._2, o._3) != firstOf(o._1))
      .flatMap { case (_, id, i) => (i to i + 3).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    docs.sortBy(_._1).map { case (id, _) =>
      val w = toks(id)
      val cutSet = cut.getOrElse(id, Set.empty)
      val kept = w.zipWithIndex.collect { case (t, i) if !cutSet(i) => t }
      (id, w.length.toLong, cutSet.size.toLong, kept.length.toLong, kept.mkString(" "))
    }
  }

  test("handcheck: first occurrence survives intact, later ones are cut") {
    // "a b c d" occurs 3x: doc 1 pos 0 (first), doc 1 pos 5, doc 2 pos 1.
    // Doc 3 shares no frequent span and is untouched.
    val docs = Seq(
      1L -> "a b c d x a b c d",
      2L -> "z a b c d y",
      3L -> "p q r s t")
    val got = run(docs)
    assert(got == Seq(
      (1L, 9L, 4L, 5L, "a b c d x"),
      (2L, 6L, 4L, 2L, "z y"),
      (3L, 5L, 0L, 5L, "p q r s t")), s"got $got")
    assert(got == ref(docs))
  }

  test("handcheck: overlapping frequent spans union their coverage") {
    // two overlapping frequent spans cut overlapping windows in doc 3;
    // union coverage must not double-count n_cut
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d e",
      3L -> "a b c d e")
    val got = run(docs)
    // spans "a b c d" and "b c d e" both frequent (3 occurrences each);
    // firsts are both in doc 1 -> doc 1 fully kept, docs 2-3 fully cut
    assert(got == Seq(
      (1L, 5L, 0L, 5L, "a b c d e"),
      (2L, 5L, 5L, 0L, ""),
      (3L, 5L, 5L, 0L, "")), s"got $got")
    assert(got == ref(docs))
  }

  test("handcheck: within-doc multiplicity counts toward the threshold") {
    // all 3 occurrences inside ONE doc: first survives, rest cut
    val docs = Seq(1L -> "k l m n k l m n k l m n", 2L -> "u v")
    val got = run(docs)
    assert(got == Seq(
      (1L, 12L, 8L, 4L, "k l m n"),
      (2L, 2L, 0L, 2L, "u v")), s"got $got")
    assert(got == ref(docs))
  }

  test("property: cut/keep partitions every doc and matches the reference") {
    // tiny alphabet so 4-spans repeat across random docs
    val genDoc = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val genCorpus = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t })
    val prop = Prop.forAll(genCorpus) { corpus =>
      val got = run(corpus)
      got.forall { case (_, nTok, nCut, nKept, text) =>
        nCut + nKept == nTok &&
          (text.isEmpty || text.split(" ", -1).length == nKept)
      } && got == ref(corpus)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("q335 plan: cut-list match stays keyed — no all-pairs fallback") {
    val dir = tmpDir("spandedup_plan")
    writeDocs(dir, Seq(1L -> "a b c d e a b c d", 2L -> "a b c d f",
      3L -> "a b c d"))
    val plan = graft.SparkEntry.queries("q335_span_dedup_apply")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span-dedup must never go all-pairs:\n$plan")
  }
}
