package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.StreamingOps.{bucketZero, foldBucketOrdered}

/** The q284/q285 token-bucket fold, pinned against an independent
  * step-by-step reference plus hand-reasoned boundary cases (refill cap,
  * truncating per-gap credit, exact-period refills), and — the property
  * the streaming path depends on — exactness under arbitrary micro-batch
  * splits of the same ordered history. */
class TokenBucketFoldSpec extends AnyFunSuite {

  private val Rate = 600000000000L // 1 token / 10 min, in ns

  /** Reference recurrence, written separately from the production fold. */
  private def reference(tss: Seq[Long]): (Long, Long) = {
    var avail = 5L
    var prev = Option.empty[Long]
    var adm = 0L
    tss.foreach { ts =>
      prev.foreach(p => avail = math.min(5L, avail + (ts - p) / Rate))
      prev = Some(ts)
      if (avail > 0) { adm += 1; avail -= 1 }
    }
    (tss.length.toLong, adm)
  }

  test("burst of 7 simultaneous events admits exactly the 5-token capacity") {
    val st = foldBucketOrdered(bucketZero, Iterator.fill(7)(1000L))
    assert(st.n == 7 && st.adm == 5)
  }

  test("one full refill interval restores exactly one token") {
    // drain, a sub-period gap earns nothing, a full-period gap earns one
    val tss = Seq.fill(5)(0L) ++ Seq(Rate - 1, Rate - 1 + Rate)
    val st = foldBucketOrdered(bucketZero, tss.iterator)
    assert(st.adm == 6 && st.n == 7)
  }

  test("refill credit is per-gap truncating division, not accumulated remainder") {
    // three gaps of 2/3 period each: every gap rounds to zero credit even
    // though the total elapsed spans two full periods
    val tss = Seq.fill(5)(0L) ++ Seq(1, 2, 3).map(i => i * (Rate * 2 / 3))
    val st = foldBucketOrdered(bucketZero, tss.iterator)
    assert(st.adm == 5)
  }

  test("cap holds: a long absence never grants more than capacity") {
    val st = foldBucketOrdered(bucketZero,
      (Seq.fill(5)(0L) ++ Seq.fill(7)(100L * Rate)).iterator)
    assert(st.adm == 10)
  }

  test("incremental fold equals the reference on random histories") {
    val gaps = Gen.listOfN(60, Gen.chooseNum(0L, 2L * Rate))
    val prop = Prop.forAll(gaps) { gs =>
      val tss = gs.scanLeft(0L)(_ + _)
      val st = foldBucketOrdered(bucketZero, tss.iterator)
      val (n, adm) = reference(tss)
      st.n == n && st.adm == adm
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("splitting the history across fold calls (micro-batches) is exact") {
    val gen = for {
      gs <- Gen.listOfN(40, Gen.chooseNum(0L, 2L * Rate))
      k <- Gen.chooseNum(0, 40)
    } yield (gs, k)
    val prop = Prop.forAll(gen) { case (gs, k) =>
      val tss = gs.scanLeft(0L)(_ + _)
      val (a, b) = tss.splitAt(k)
      val once = foldBucketOrdered(bucketZero, tss.iterator)
      val twice = foldBucketOrdered(
        foldBucketOrdered(bucketZero, a.iterator), b.iterator)
      once == twice
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("cross-batch late data fails loudly instead of minting negative credit") {
    // an event older than the persisted prevTs would feed a negative gap
    // into the refill — the fold must reject it, not corrupt the bucket
    val st = foldBucketOrdered(bucketZero, Iterator(10L * Rate))
    val e = intercept[IllegalStateException] {
      foldBucketOrdered(st, Iterator(9L * Rate))
    }
    assert(e.getMessage.contains("late data"), e.getMessage)
    // equal timestamps are NOT late (ties are legal: zero gap, zero refill)
    val tied = foldBucketOrdered(st, Iterator(10L * Rate))
    assert(tied.n == 2 && tied.prevTs == 10L * Rate)
  }
}
