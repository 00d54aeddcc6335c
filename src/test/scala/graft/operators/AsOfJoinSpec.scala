package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("backward as-of: latest right at-or-before, nulls before first, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 305L, "t3"),
      (2L, 150L, "t4"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, 90L, 10.0), (1L, 200L, 11.0), (1L, 300L, 12.0),
      (2L, 500L, 99.0))
      .toDF("k", "t", "px")

    val out = AsOfJoin.backward(trades, quotes, "k", "t",
        Map("px" -> "quote_px", "t" -> "quote_t"))
      .orderBy($"k", $"t").collect()
      .map(r => (r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("quote_px")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("quote_t")).map(_.toLong)))

    assert(out.toSeq == Seq(
      ("t1", Some(10.0), Some(90L)),   // strictly-before quote
      ("t2", Some(11.0), Some(200L)),  // exact-time quote wins
      ("t3", Some(12.0), Some(300L)),  // latest of several
      ("t4", None, None)))             // no quote at-or-before → nulls
  }

  test("forward as-of: earliest right at-or-after, nulls after last, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 305L, "t3"),
      (2L, 600L, "t4"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, 90L, 10.0), (1L, 200L, 11.0), (1L, 300L, 12.0),
      (2L, 500L, 99.0))
      .toDF("k", "t", "px")

    val out = AsOfJoin.forward(trades, quotes, "k", "t",
        Map("px" -> "quote_px", "t" -> "quote_t"))
      .orderBy($"k", $"t").collect()
      .map(r => (r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("quote_px")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("quote_t")).map(_.toLong)))

    assert(out.toSeq == Seq(
      ("t1", Some(11.0), Some(200L)),  // earliest strictly-after quote
      ("t2", Some(11.0), Some(200L)),  // exact-time quote wins
      ("t3", None, None),              // no quote at-or-after → nulls
      ("t4", None, None)))             // right exists only BEFORE → nulls
  }
}
