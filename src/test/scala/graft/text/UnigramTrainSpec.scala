package graft.text

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Handchecks + the reference-model property behind
  * [[graft.text.UnigramTrain]]: the distributed hard-EM trainer must
  * reproduce a sequential plain-Scala reference — per round the exact
  * Viterbi segmentation (score = Σ weight·len², ties to the longer final
  * piece) under the round's weights, then usage-count re-estimation with
  * 1-gram-preserving pruning — on arbitrary corpora, including weight
  * regimes where re-estimation flips the optimal segmentation between
  * rounds (the behavior that distinguishes EM from one-shot inference).
  */
class UnigramTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def trainSpark(corpus: Seq[String], rounds: Int, topK: Int)
      : Seq[UnigramTrain.PieceRound] =
    UnigramTrain.train(corpus.toDF("t"), "t", rounds, topK)

  /** Reference: the sequential textbook loop on plain Scala collections. */
  private def trainRef(corpus: Seq[String], rounds: Int, topK: Int)
      : Seq[UnigramTrain.PieceRound] = {
    val grams = corpus.flatMap { s =>
      for (l <- 1 to 4; i <- 0 to s.length - l) yield s.substring(i, i + l)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = grams.toSeq.sortBy { case (p, c) => (-c, p) }.take(topK)
    val alphabet = grams.keySet.filter(_.length == 1)
    var vocab: Map[String, Long] =
      (top ++ grams.filter { case (p, _) => p.length == 1 }).toMap

    def viterbi(s: String, v: Map[String, Long]): Seq[String] = {
      val n = s.length
      val best = Array.fill(n + 1)(Long.MinValue)
      val from = Array.fill(n + 1)(-1)
      best(0) = 0L; from(0) = 0
      for (k <- 1 to n; l <- math.min(4, k) to 1 by -1) {
        if (from(k - l) >= 0) v.get(s.substring(k - l, k)).foreach { w =>
          val sc = best(k - l) + w * l * l
          // strictly-greater replace while scanning l DESCENDING = the
          // kernel's longer-final-piece tie rule
          if (sc > best(k) || from(k) < 0) { best(k) = sc; from(k) = l }
        }
      }
      assert(from(n) >= 0, s"unreachable segmentation for '$s'")
      var pos = n
      var out = List.empty[String]
      while (pos > 0) { val l = from(pos); out = s.substring(pos - l, pos) :: out; pos -= l }
      out
    }

    val res = Seq.newBuilder[UnigramTrain.PieceRound]
    for (r <- 1 to rounds) {
      val usage = corpus.flatMap(viterbi(_, vocab))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      usage.toSeq.sortBy(_._1).foreach { case (p, u) =>
        res += UnigramTrain.PieceRound(r, p, vocab(p), u)
      }
      vocab = usage ++ alphabet.iterator.collect {
        case a if !usage.contains(a.toString) => a.toString -> 0L
      }
    }
    res.result()
  }

  test("handcheck: round 1 re-estimation collapses the vocabulary onto used pieces") {
    // 'abab' x3: seed grams make 'abab' (cnt 3) a top piece; score
    // 3*16=48 beats any split, so round 1 uses ONLY 'abab' — every other
    // piece (including all 1-grams) drops to weight 0 and multi-grams prune.
    val corpus = Seq("abab", "abab", "abab")
    val t = trainSpark(corpus, 2, topK = 200)
    val r1 = t.filter(_.round == 1)
    assert(r1 == Seq(UnigramTrain.PieceRound(1, "abab", 3L, 3L)))
    // round 2: vocab = {abab->3, a->0, b->0}; 'abab' still wins (48 > 0)
    assert(t.filter(_.round == 2) == Seq(UnigramTrain.PieceRound(2, "abab", 3L, 3L)))
  }

  test("handcheck: 1-grams survive pruning at weight 0 and keep segmentation total") {
    // tiny topK forces the seed to drop most multi-grams; every string
    // must still segment (via 1-grams) in every round
    val corpus = Seq("xyz", "zyx", "xxyy")
    val t = trainSpark(corpus, 3, topK = 2)
    assert(t.nonEmpty)
    // per round, total piece usage re-assembles the corpus: sum over
    // pieces of n_used*len == total chars
    val chars = corpus.map(_.length).sum
    (1 to 3).foreach { r =>
      val rows = t.filter(_.round == r)
      assert(rows.map(p => p.nUsed * p.piece.length).sum == chars.toLong,
        s"round $r does not tile the corpus")
    }
  }

  test("handcheck: weights re-estimate downward (usage <= seed counts) in round 1") {
    val t = trainSpark(Seq("banana", "bandana"), 1, topK = 200)
    assert(t.forall(p => p.nUsed <= p.wIn),
      "a piece cannot be used more times than it occurs")
  }

  test("property: distributed trainer == sequential reference on random corpora") {
    val genStr = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genCorpus = Gen.choose(1, 8).flatMap(Gen.listOfN(_, genStr))
    val prop = Prop.forAll(genCorpus, Gen.choose(1, 3), Gen.oneOf(3, 10, 200)) {
      (corpus: List[String], rounds: Int, topK: Int) =>
        trainSpark(corpus, rounds, topK) == trainRef(corpus, rounds, topK)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
