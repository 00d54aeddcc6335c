package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: for random trade/quote sets, the as-of join equals the
  * brute-force definition "latest quote with t <= trade's t, per key". */
class AsOfJoinPropertySpec extends SparkTestBase {

  test("asof join equals brute-force latest-at-or-before for random inputs") {
    import spark.implicits._
    val genRows: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] = for {
      trades <- Gen.listOfN(40, for {
        k <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 100L)
      } yield (k, t))
      quotes <- Gen.listOfN(25, for {
        k <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 100L)
        px <- Gen.choose(1, 999).map(_ / 10.0)
      } yield (k, t, px))
    } yield (trades, quotes)

    val prop = Prop.forAll(genRows) { case (trades, quotesRaw) =>
      // unique quote grain per (key, time): required contract of backward()
      val quotes = quotesRaw.groupBy(q => (q._1, q._2)).values.map(_.head).toList
      val tradesDf = trades.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("tid", "k", "t")
      val quotesDf = quotes.toDF("k", "t", "px")

      val got = AsOfJoin.backward(tradesDf, quotesDf, "k", "t",
          Map("px" -> "px", "t" -> "qt"))
        .collect()
        .map(r => r.getAs[Long]("tid") ->
          (Option(r.getAs[java.lang.Double]("px")).map(_.toDouble),
           Option(r.getAs[java.lang.Long]("qt")).map(_.toLong)))
        .toMap

      val expected = trades.zipWithIndex.map { case ((k, t), i) =>
        val cand = quotes.filter(q => q._1 == k && q._2 <= t)
        val best = if (cand.isEmpty) (None, None)
        else {
          val m = cand.maxBy(_._2)
          (Some(m._3), Some(m._2))
        }
        i.toLong -> best
      }.toMap

      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
