package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.graft.UnigramViterbi
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of the q330 DP kernel on random inputs (the gate spec only
  * exercises the c_name corpus):
  *  - OPTIMALITY: the kernel's score equals the brute-force maximum over
  *    every segmentation into vocabulary pieces;
  *  - VALIDITY: the pieces concatenate back to the input and their
  *    scores re-sum to the reported total;
  *  - TIE RULE: among all optimal segmentations, the kernel returns the
  *    one whose piece-length sequence read RIGHT-TO-LEFT is
  *    lexicographically largest — the declarative characterization of
  *    "scan L descending, replace on strictly greater" that the DuckDB
  *    oracle's (score DESC, L DESC) argmax must agree with. */
class UnigramViterbiPropertySpec extends SparkTestBase {

  private def brute(s: String, vocab: Map[String, Long]): Seq[List[String]] = {
    def segs(i: Int): Seq[List[String]] =
      if (i == s.length) Seq(Nil)
      else (1 to math.min(4, s.length - i)).flatMap { l =>
        val p = s.substring(i, i + l)
        if (vocab.contains(p)) segs(i + l).map(p :: _) else Nil
      }
    segs(0)
  }

  test("kernel DP is optimal with the declared tie rule on random inputs") {
    val genCase = for {
      n <- Gen.choose(1, 9)
      s <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      singles <- Gen.sequence[List[(String, Long)], (String, Long)](
        List("a", "b", "c").map(ch =>
          Gen.choose(1L, 5L).map(w => ch -> w)))
      nMulti <- Gen.choose(0, 6)
      multis <- Gen.listOfN(nMulti, for {
        l <- Gen.choose(2, 4)
        p <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
        w <- Gen.choose(1L, 5L)
      } yield (p, w))
    } yield (s, (singles ++ multis).toMap)

    val prop = Prop.forAll(genCase) { case (s, vocab) =>
      val m = new java.util.HashMap[String, java.lang.Long]()
      vocab.foreach { case (p, w) => m.put(p, java.lang.Long.valueOf(w)) }
      val row = UnigramViterbi.segment(UTF8String.fromString(s), m)
      def score(seg: List[String]) = seg.map(p => vocab(p) * p.length * p.length).sum
      val all = brute(s, vocab)
      val got = row.getArray(0)
      val pieces = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toList
      val best = all.map(score).max
      // validity + optimality
      val okValid = pieces.mkString("") == s &&
        score(pieces) == row.getLong(1) && pieces.length == row.getInt(2)
      val okOpt = row.getLong(1) == best
      // tie rule: reversed length sequence lexicographically largest
      implicit val ord: Ordering[List[Int]] = Ordering.Implicits.seqOrdering
      val expect = all.filter(sg => score(sg) == best)
        .maxBy(sg => sg.map(_.length).reverse)
      okValid && okOpt && pieces == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
