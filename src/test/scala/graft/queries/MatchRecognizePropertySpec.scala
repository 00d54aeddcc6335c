package graft.queries

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property behind the q332 gate's central claim: RUN-SPACE matching of
  * the pattern S C+ P (maximal same-symbol runs, then a fixed-width
  * window over the run sequence) equals what a real regex engine computes
  * for `sc+p` leftmost-first — anchor position, click count, and
  * converting-row position — on arbitrary symbol sequences, not just the
  * events fixture. The regex engine appears ONLY here, as the
  * independent referee; the engine and the oracle both use the window
  * algebra. */
class MatchRecognizePropertySpec extends SparkTestBase {

  private def runSpace(s: String): Option[(Int, Int, Int)] = {
    if (s.isEmpty) return None
    // runs as (symbol, startIdx, len)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Char, Int, Int)]
    var i = 0
    while (i < s.length) {
      var j = i
      while (j < s.length && s(j) == s(i)) j += 1
      runs += ((s(i), i, j - i)); i = j
    }
    runs.indices.dropRight(2).collectFirst {
      case r if runs(r)._1 == 's' && runs(r + 1)._1 == 'c' &&
        runs(r + 2)._1 == 'p' =>
        val anchor = runs(r)._2 + runs(r)._3 - 1 // LAST s of the run
        (anchor, runs(r + 1)._3, runs(r + 2)._2) // first p of the p-run
    }
  }

  private def regexEngine(s: String): Option[(Int, Int, Int)] = {
    val m = java.util.regex.Pattern.compile("sc+p").matcher(s)
    if (m.find()) Some((m.start, m.end - m.start - 2, m.end - 1)) else None
  }

  test("run-space S C+ P equals regex sc+p leftmost match on random sequences") {
    val genSeq = for {
      n <- Gen.choose(0, 30)
      cs <- Gen.listOfN(n, Gen.frequency(
        (2, 's'), (4, 'c'), (2, 'p'), (3, 'v')))
    } yield cs.mkString
    val prop = Prop.forAll(genSeq) { s =>
      runSpace(s) == regexEngine(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
