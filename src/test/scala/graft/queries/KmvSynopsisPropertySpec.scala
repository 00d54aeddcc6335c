package graft.queries

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of the q328 KMV set-operation algebra on random inputs
  * (the gate spec replays only the shingle corpus):
  *  - MERGED-SYNOPSIS VALIDITY: the k smallest of S_A ∪ S_B are exactly
  *    the k smallest of the TRUE union whenever each side's sketch is
  *    either full (k values) or its complete set — the Beyer et al.
  *    precondition the gate's scaladoc argues; here it is checked against
  *    ground truth, not argued;
  *  - EXACT REGIME: when the merged sketch holds fewer than k values,
  *    est_union equals the true union size exactly;
  *  - JACCARD NUMERATOR: the matched count within the merged synopsis
  *    equals |k-smallest-of-union ∩ A ∩ B| computed from the full sets.
  * Hash injectivity is modeled by drawing distinct Long elements
  * directly — any injective hash reduces to this. */
class KmvSynopsisPropertySpec extends SparkTestBase {

  private val K = 8 // small k exercises both regimes densely

  test("KMV merged synopsis is valid on random set pairs") {
    val genSets = for {
      na <- Gen.choose(0, 24)
      nb <- Gen.choose(0, 24)
      a <- Gen.listOfN(na, Gen.choose(1L, 60L)).map(_.toSet)
      b <- Gen.listOfN(nb, Gen.choose(1L, 60L)).map(_.toSet)
    } yield (a, b)

    val prop = Prop.forAll(genSets) { case (a, b) =>
      val skA = a.toVector.sorted.take(K)
      val skB = b.toVector.sorted.take(K)
      val merged = (skA.toSet ++ skB.toSet).toVector.sorted
      val m = math.min(K, merged.length)
      val top = merged.take(m)
      val trueUnion = (a ++ b).toVector.sorted
      // validity: merged k-smallest == true union's k-smallest
      val okValid = top == trueUnion.take(m)
      // exact regime
      val okExact = merged.length >= K ||
        merged.length == trueUnion.length
      // jaccard numerator from sketches == from full sets
      val fromSketch = top.count(v => skA.contains(v) && skB.contains(v))
      val fromTruth = trueUnion.take(m).count(v => a(v) && b(v))
      okValid && okExact && fromSketch == fromTruth
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
