package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Arithmetic invariants behind the session-2 gates that the oracle hash
  * pins only at the two tested scale factors — re-proven here over the
  * whole input space (pure-Scala properties) and on the live engine at
  * sf0.001.
  *
  * q346's rank→bucket formula must BE ntile(3) for every n; q347's
  * largest-remainder apportionment must spend the budget exactly and
  * stay within 1 of the real-valued pro-rata share (the quota property
  * that makes it a correct sampler); q351's codes must stay in [0, 255];
  * q355's count-of-counts must tile the vocabulary. */
class Session2InvariantSpec extends SparkTestBase {

  test("q346: the explicit rank->bucket arithmetic equals ntile(3) for every n >= 3") {
    // reference ntile: first (n mod k) buckets have size n/k + 1
    def ntileRef(n: Long, rank: Long): Long = {
      val k = 3L
      val q = n / k
      val r = n % k
      val cut = r * (q + 1)
      if (rank <= cut) (rank + q) / (q + 1)
      else r + (rank - cut + q - 1) / q
    }
    (3L to 400L).foreach { n =>
      var sizes = Map.empty[Long, Long].withDefaultValue(0L)
      (1L to n).foreach { rk =>
        val b = ntileRef(n, rk)
        assert(b >= 1 && b <= 3, s"n=$n rank=$rk bucket=$b out of range")
        sizes += b -> (sizes(b) + 1)
      }
      // ntile contract: bucket sizes differ by at most 1 and are
      // non-increasing in bucket index
      val s = (1L to 3L).map(sizes)
      assert(s.max - s.min <= 1 && s == s.sorted.reverse,
        s"n=$n sizes=$s violate the ntile contract")
    }
  }

  test("q347/q187: largest remainder spends the budget exactly and stays within 1 of pro-rata") {
    val genW = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 500L)))
    val prop = Prop.forAll(genW, Gen.choose(1L, 1000L)) { (ws: List[Long], budget: Long) =>
      val t = ws.sum
      val base = ws.map(w => budget * w / t)
      val rem = ws.map(w => budget * w % t)
      val leftover = budget - base.sum
      val order = rem.zipWithIndex.sortBy { case (r, i) => (-r, i) }
        .map(_._2).zipWithIndex.toMap
      val alloc = base.zipWithIndex.map { case (b, i) =>
        b + (if (order(i) < leftover) 1L else 0L)
      }
      alloc.sum == budget && alloc.zip(ws).forall { case (a, w) =>
        val exact = budget.toDouble * w / t
        math.abs(a - exact) < 1.0 + 1e-9
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("q351: every SQ8 code is in [0, 255] and err_micro is non-negative (live engine)") {
    val df = SparkEntry.queries("q351_sq8_quantize")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val codeSum = r.getAs[Long]("code_sum")
      val err = r.getAs[Long]("err_micro")
      assert(codeSum >= 0 && codeSum <= 255L * 64, s"code_sum $codeSum out of range")
      assert(err >= 0, s"negative err_micro $err")
    }
  }

  test("q355: count-of-counts tiles the vocabulary and hapax mass bounds unseen estimate (live engine)") {
    import spark.implicits._
    val rows = SparkEntry.queries("q355_good_turing")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"),
        r.getAs[Long]("n_next"), r.getAs[Long]("rstar_ppm")))
    val zero = rows.find(_._1 == 0L).get
    // r = 0 row: n_r is the total token count, n_next the hapax count
    assert(zero._2 > 0 && zero._3 <= zero._2)
    assert(zero._4 == zero._3 * 1000000L / zero._2, "p0 must be N1/N in ppm")
    // r >= 1 rows: N_r counts types, adjusted counts are >= 0
    rows.filter(_._1 >= 1).foreach { case (r, nr, nn, rstar) =>
      assert(nr >= 0 && nn >= 0 && rstar >= 0, s"row r=$r broke positivity")
    }
  }
}
