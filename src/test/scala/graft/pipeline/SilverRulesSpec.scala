package graft.pipeline

import java.sql.{Date, Timestamp}
import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Silver validation semantics: the FIXTURES.md §3 edge-case table
  * (one row per reject path), latest-wins dedup determinism, and the
  * ScalaCheck invariants of SURVEY §5.2: valid ∪ rejected = input
  * (disjoint), and reject_reason is always the first failing rule.
  */
class SilverRulesSpec extends SparkTestBase {

  private val ts1 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val ts2 = Timestamp.valueOf("2026-01-02 00:00:00")

  private def mkRow(symbol: String, date: Date, open: java.lang.Double,
                    high: java.lang.Double, low: java.lang.Double,
                    close: java.lang.Double, volume: java.lang.Long,
                    ingestedAt: Timestamp = ts1): Row =
    Row(symbol, date, open, high, low, close, volume, "test", ingestedAt, "f.csv")

  private def df(rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq),
      org.apache.spark.sql.types.StructType(Schemas.bronze.map(_.copy(nullable = true))))

  private val d = Date.valueOf("2025-12-22")

  test("FIXTURES §3: each edge case takes its first-matching reject reason") {
    val rows = Seq(
      mkRow(null, d, 10.0, 11.0, 9.0, 10.5, 100L),                 // missing_key
      mkRow("A", d, 10.0, 11.0, 9.0, null, 100L),                  // missing_prices
      mkRow("B", d, 10.0, 11.0, -0.5, 10.5, 100L),                 // non_positive_price
      mkRow("C", d, 10.0, 9.0, 8.0, 9.5, 100L),                    // ohlc_inconsistent
      mkRow("D", d, 10.0, 11.0, 9.0, 10.5, -100L),                 // invalid_volume
      mkRow("E", d, 10.0, 11.0, 9.0, 10.5, null),                  // FX null volume: VALID
      mkRow("F", d, 0.0, 11.0, -1.0, 10.5, 100L))                  // non_positive wins over ohlc
    val (valid, rejected) = SilverTransform.split(df(rows: _*))
    val reasons = rejected.select("symbol", "reject_reason").collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getString(1)).toMap
    assert(reasons == Map(
      "<null>" -> "missing_key",
      "A" -> "missing_prices",
      "B" -> "non_positive_price",
      "C" -> "ohlc_inconsistent",
      "D" -> "invalid_volume",
      "F" -> "non_positive_price"))
    assert(valid.select("symbol").collect().map(_.getString(0)).toSet == Set("E"))
  }

  test("latest-wins dedup keeps the newest ingested_at per (symbol,date)") {
    val rows = Seq(
      mkRow("A", d, 1.0, 2.0, 0.5, 1.5, 10L, ts1),
      mkRow("A", d, 9.0, 9.5, 8.5, 9.2, 20L, ts2), // later — must survive
      mkRow("B", d, 3.0, 4.0, 2.5, 3.5, 30L, ts1))
    val out = SilverTransform.dedupLatest(df(rows: _*))
    assert(out.count() == 2)
    val a = out.filter(col("symbol") === "A").collect().head
    assert(a.getAs[Double]("close") == 9.2 && a.getAs[Long]("volume") == 20L)
  }

  test("property: valid ∪ rejected = deduped input; reason = first failing rule") {
    val genVal: Gen[java.lang.Double] = Gen.oneOf(
      Gen.const(null.asInstanceOf[java.lang.Double]),
      Gen.choose(-5.0, 15.0).map(Double.box))
    val genVol: Gen[java.lang.Long] = Gen.oneOf(
      Gen.const(null.asInstanceOf[java.lang.Long]),
      Gen.choose(-100L, 100L).map(Long.box))
    val genRow: Gen[Row] = for {
      sym <- Gen.oneOf("A", "B", null)
      o <- genVal; h <- genVal; l <- genVal; c <- genVal; v <- genVol
    } yield mkRow(sym, d, o, h, l, c, v)

    // Reference-rule oracle, in plain Scala, matching 02:51-87's order.
    def expected(r: Row): Option[String] = {
      def dbl(i: Int): Option[Double] = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val (o, h, l, c) = (dbl(2), dbl(3), dbl(4), dbl(5))
      if (r.isNullAt(0) || r.isNullAt(1)) Some("missing_key")
      else if (Seq(o, h, l, c).exists(_.isEmpty)) Some("missing_prices")
      else if (Seq(o, h, l, c).flatten.exists(_ <= 0)) Some("non_positive_price")
      else if (h.get < Seq(o.get, c.get, l.get).max ||
               l.get > Seq(o.get, c.get, h.get).min) Some("ohlc_inconsistent")
      else if (!r.isNullAt(6) && r.getLong(6) < 0) Some("invalid_volume")
      else None
    }

    val prop = Prop.forAll(Gen.listOfN(30, genRow)) { rows =>
      // distinct (symbol,date) per row not guaranteed; skip dedup, test split only
      val input = df(rows: _*)
      val (valid, rejected) = SilverTransform.split(input)
      val nOk = valid.count()
      val rej = rejected.collect()
      val expectedReasons = rows.map(expected)
      val nExpectedRejects = expectedReasons.count(_.isDefined)
      val reasonsMatch = rej.forall { r =>
        expected(r) == Some(r.getAs[String]("reject_reason"))
      }
      (nOk + rej.length == rows.length) &&
        rej.length == nExpectedRejects && reasonsMatch
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
