package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Handchecks + the reference-model property behind
  * [[graft.text.BpeTrain]]: the distributed trainer must reproduce the
  * textbook sequential loop — per round the exact (count DESC, a, b)
  * argmax over adjacent a ≠ b pairs, then ONE left-to-right merge pass —
  * on arbitrary corpora, including those forcing multi-level rules
  * (a learned rule whose side is itself a merged token). */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def trainSpark(corpus: Seq[Seq[String]], k: Int)
      : (Seq[BpeTrain.Learned], Seq[Seq[String]]) = {
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w")
    val (rules, fin) = BpeTrain.train(df, "w", k)
    val state = fin.orderBy($"doc_id").collect().map(_.getSeq[String](1).toList).toSeq
    (rules, state)
  }

  /** Reference: the sequential textbook trainer. */
  private def trainRef(corpus: Seq[Seq[String]], k: Int)
      : (Seq[BpeTrain.Learned], Seq[Seq[String]]) = {
    var cur = corpus.map(_.toVector).toVector
    val out = Seq.newBuilder[BpeTrain.Learned]
    var r = 1
    var stop = false
    while (r <= k && !stop) {
      val pairs = cur.flatMap(w => if (w.length < 2) Nil else w.zip(w.tail))
        .filter(p => p._1 != p._2)
      if (pairs.isEmpty) stop = true
      else {
        val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += BpeTrain.Learned(r, a, b, cnt, counts.size.toLong,
          counts.values.sum)
        cur = cur.map { w =>
          val o = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
              o += s"$a$b"; i += 2
            } else { o += w(i); i += 1 }
          }
          o.result()
        }
        r += 1
      }
    }
    (out.result(), cur.map(_.toList))
  }

  test("handcheck: learns the dominant pair first, then a multi-level rule") {
    // "x y" dominates; after round 1 the corpus is full of "xy", making
    // (xy, z) the round-2 winner — a rule whose LEFT side is a merged
    // token, which only a genuinely multi-level trainer can adopt.
    val corpus = Seq.fill(4)(Seq("x", "y", "z")) ++ Seq(Seq("x", "y"))
    val (rules, state) = trainSpark(corpus, 3)
    assert(rules.map(l => (l.a, l.b)) == Seq("x" -> "y", "xy" -> "z"))
    assert(rules.head.cnt == 5L && rules(1).cnt == 4L)
    assert(state == Seq.fill(4)(List("xyz")) ++ Seq(List("xy")))
  }

  test("handcheck: self-pairs are never adopted and adjacent merges don't overlap") {
    // (a, a) is the most frequent raw pair but is excluded by contract;
    // (a, b) occurrences at positions 2 and 4 of "a a b a b" are
    // non-overlapping and both merge in one pass.
    val corpus = Seq(Seq("a", "a", "b", "a", "b"), Seq("a", "a", "a"))
    val (rules, state) = trainSpark(corpus, 1)
    assert(rules.map(l => (l.a, l.b)) == Seq("a" -> "b"))
    assert(rules.head.cnt == 2L)
    assert(state == Seq(List("a", "ab", "ab"), List("a", "a", "a")))
  }

  test("handcheck: stops early when no a != b pair remains") {
    val (rules, state) = trainSpark(Seq(Seq("q", "q", "q"), Seq("z")), 5)
    assert(rules.isEmpty)
    assert(state == Seq(List("q", "q", "q"), List("z")))
  }

  test("handcheck: round witnesses count the live candidate table") {
    // round 1 candidates over {(a,b):2, (b,a):1}: n_pairs=2, tot=3
    val (rules, _) = trainSpark(Seq(Seq("a", "b", "a", "b")), 1)
    assert(rules == Seq(BpeTrain.Learned(1, "a", "b", 2L, 2L, 3L)))
  }

  test("documented divergence: incremental training state != best-first re-encode " +
      "exactly on token collisions") {
    // The corpus WORD "ab" collides with the concat of the later rule
    // (a, b). Round 1 adopts (ab, c) — count 6 beats (a, b)'s 5; round 2
    // adopts (a, b), which CREATES new "ab" tokens. The incremental
    // trainer never revisits round 1, so "a b c" ends as ["ab", "c"];
    // best-first re-encoding with the same table re-searches from the
    // top and merges on to ["abc"]. This is the precise case BpeMergePass
    // and q339 document as the train-time vs encode-time distinction.
    // Counts: (ab,c) = 7 > (a,b) = 5 + 1 = 6, so adoption order is pinned.
    val corpus = Seq.fill(7)(Seq("ab", "c")) ++ Seq.fill(5)(Seq("a", "b")) ++
      Seq(Seq("a", "b", "c"))
    val (rules, state) = trainSpark(corpus, 2)
    assert(rules.map(l => (l.a, l.b)) == Seq("ab" -> "c", "a" -> "b"))
    assert(state.last == List("ab", "c")) // incremental: rule 1 not revisited
    val reEncoded = Seq(Tuple1(Seq("a", "b", "c"))).toDF("w")
      .select(graft.functions.bpe.encodeMulti($"w",
        rules.map(l => (l.a, l.b))).as("e"))
      .collect().head.getSeq[String](0)
    assert(reEncoded == Seq("abc")) // best-first: (a,b) fires, then (ab,c)
  }

  test("property: distributed trainer == sequential reference on random corpora") {
    // small alphabet so pairs repeat (forcing real merges and frequent
    // multi-level follow-ups), doc lengths 0-8, up to 12 docs, k up to 6
    val genDoc = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val genCorpus = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, genDoc))
    val prop = Prop.forAll(genCorpus, Gen.choose(0, 6)) { (corpus, k) =>
      val (sr, ss) = trainSpark(corpus, k)
      val (rr, rs) = trainRef(corpus, k)
      sr == rr && ss == rs
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
