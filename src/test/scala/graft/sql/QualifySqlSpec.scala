package graft.sql

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The QUALIFY paste shim: the reference's literal analyst SQL must run
  * unmodified, and the rewrite must be token-safe and loud at its limits. */
class QualifySqlSpec extends SparkTestBase {

  private lazy val gold: DataFrame = {
    import spark.implicits._
    Seq(
      ("SPY", "2025-12-22", 100.0, Some(0.001), Some(0.010), Some(1000.0)),
      ("SPY", "2025-12-24", 112.5, Some(0.004), Some(0.090), Some(1100.0)),
      ("GLD", "2025-12-22", 50.0, Some(-0.002), Some(0.005), Some(500.0)),
      ("GLD", "2025-12-24", 51.0, Some(0.009), Some(0.006), Some(600.0)))
      .toDF("symbol", "ds", "close", "return_1d", "vol_20d", "avg_volume_20d")
      .withColumn("date", to_date(col("ds"))).drop("ds")
      .withColumn("computed_at", lit(Timestamp.valueOf("2026-01-02 00:00:00")))
  }

  test("the reference's Q1 text runs verbatim (sql/example_queries.sql:7-15)") {
    gold.createOrReplaceTempView("gold_market_features_daily")
    // pasted byte-for-byte from the reference file — the shim's whole point
    val referenceQ1 =
      """SELECT
        |  symbol,
        |  date,
        |  close,
        |  return_1d,
        |  vol_20d
        |FROM gold_market_features_daily
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date DESC) = 1
        |ORDER BY symbol;""".stripMargin
    val viaShim = QualifySql.sql(spark, referenceQ1)
    assert(viaShim.columns.toSeq ==
      Seq("symbol", "date", "close", "return_1d", "vol_20d"))
    val expected = graft.pipeline.AnalystQueries.latestSnapshot(gold)
      .select("symbol", "date", "close", "return_1d", "vol_20d")
    assert(viaShim.collect().toSeq == expected.collect().toSeq)
  }

  test("the q04 gate shape through QUALIFY matches the DataFrame result") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders")
    val viaShim = QualifySql.sql(spark,
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        |  CAST(o_orderdate AS DATE) AS latest_orderdate,
        |  o_totalprice AS latest_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin)
    val expected = graft.SparkEntry.queries("q04_latest_per_key")(spark, dir)
    assert(viaShim.collect().toSeq == expected.collect().toSeq)
  }

  test("EVERY statement of the reference's example_queries.sql runs verbatim") {
    // Read the reference file at test time (never copied into this repo):
    // a user must be able to paste the whole analyst playbook unchanged.
    val path = java.nio.file.Paths.get("/root/reference/sql/example_queries.sql")
    assume(java.nio.file.Files.exists(path), "reference checkout not present")
    val text = java.nio.file.Files.readString(path)
    val stmts = text.split(";").map(_.trim).filter { s =>
      s.replaceAll("(?m)^--.*$", "").trim.nonEmpty
    }
    assert(stmts.length == 14, s"expected the 14 reference statements, got ${stmts.length}")

    import spark.implicits._
    // gold rows engineered so every statement returns data: three symbols,
    // consecutive dates including Q8's literal DATE '2025-12-23', and a
    // >2% mover at the max date for Q6's threshold screen
    val rows = for {
      (sym, base) <- Seq(("SPY", 100.0), ("GLD", 50.0), ("QQQ", 200.0))
      d <- 20 to 24
    } yield (sym, f"2025-12-$d%02d", base + d,
      Some(if (sym == "QQQ") 0.03 else 0.001 * d),
      // QQQ's vol EXPANDS at the last date so Q7's 1.5x screen fires
      Some(if (sym == "QQQ" && d == 24) 0.5 else 0.01 * d),
      Some(base * 10))
    rows.toDF("symbol", "ds", "close", "return_1d", "vol_20d", "avg_volume_20d")
      .withColumn("date", to_date(col("ds"))).drop("ds")
      .createOrReplaceTempView("gold_market_features_daily")

    stmts.zipWithIndex.foreach { case (stmt, i) =>
      val out = QualifySql.sql(spark, stmt).collect()
      assert(out.nonEmpty, s"statement ${i + 1} returned no rows:\n$stmt")
    }
    // the QUALIFY statements (latest snapshot per symbol) must emit
    // exactly one row per symbol
    val snap = QualifySql.sql(spark, stmts(0)).collect()
    assert(snap.length == 3)
  }

  test("statements without a top-level QUALIFY pass through untouched") {
    val plain = "SELECT a, b FROM t WHERE x = 1 ORDER BY a"
    assert(QualifySql.rewrite(plain) eq plain)
    // QUALIFY in a string literal, a comment, or a subquery is not ours
    val tricky =
      """SELECT a, 'has QUALIFY inside' AS s -- QUALIFY in a comment
        |FROM (SELECT a FROM u QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1) t""".stripMargin
    assert(QualifySql.rewrite(tricky) eq tricky)
  }

  test("the rewrite keeps ORDER BY / LIMIT after the predicate") {
    val out = QualifySql.rewrite(
      "SELECT k, v FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1 ORDER BY k LIMIT 5")
    assert(out.contains("WHERE __qualify ORDER BY k LIMIT 5"), out)
    assert(out.startsWith("SELECT k, v FROM (SELECT "), out)
  }

  test("unaliased expressions run via the star-EXCEPT fallback") {
    val out = QualifySql.rewrite(
      "SELECT a + b FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1")
    assert(out.startsWith("SELECT * EXCEPT (__qualify) FROM (SELECT"), out)
    import spark.implicits._
    Seq((1, 10), (2, 20), (1, 5)).toDF("a", "b").createOrReplaceTempView("ua_t")
    val got = QualifySql.sql(spark,
      "SELECT a + b FROM ua_t QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(6, 22), got.toString) // (1,5)->6 and (2,20)->22 survive
  }

  test("each branch of a top-level set operation rewrites independently") {
    import spark.implicits._
    Seq(("k1", 1, "u"), ("k1", 2, "u"), ("k2", 9, "u"))
      .toDF("k", "v", "src").createOrReplaceTempView("un_a")
    Seq(("k1", 7, "w"), ("k2", 3, "w"), ("k2", 4, "w"))
      .toDF("k", "v", "src").createOrReplaceTempView("un_b")
    val got = QualifySql.sql(spark,
      """SELECT k, v, src FROM un_a
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1
        |UNION ALL
        |SELECT k, v, src FROM un_b
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1
        |ORDER BY src, k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    // latest per key from EACH side; the trailing ORDER BY sorts the union
    assert(got == Seq(("k1", 2, "u"), ("k2", 9, "u"), ("k1", 7, "w"), ("k2", 4, "w")), got.toString)
    // a qualify-free branch passes through: only the qualified one rewrites
    val half = QualifySql.rewrite(
      "SELECT k FROM un_a UNION SELECT k FROM un_b QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1")
    assert(half.replaceAll("\\s+", " ").startsWith("SELECT k FROM un_a UNION "), half)
    assert(half.contains("WHERE __qualify"), half)
    // set-op EXCEPT splits branches; star-EXCEPT in a select list does not
    val starExc = QualifySql.sql(spark,
      "SELECT * EXCEPT (src) FROM un_a QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
    assert(starExc.columns.toSeq == Seq("k", "v"), starExc.columns.mkString(","))
    val setExc = QualifySql.sql(spark,
      """SELECT k FROM un_a
        |EXCEPT
        |SELECT k FROM un_b QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1""".stripMargin)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(setExc == Seq("k2"), setExc.toString) // un_b's qualify keeps only k1
  }

  test("SELECT * QUALIFY runs via star-EXCEPT (no schema needed at rewrite)") {
    val out = QualifySql.rewrite(
      "SELECT * FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
    assert(out.startsWith("SELECT * EXCEPT (__qualify) FROM (SELECT"), out)
    import spark.implicits._
    Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 5))
      .toDF("k", "v", "w").createOrReplaceTempView("star_t")
    val got = QualifySql.sql(spark,
      "SELECT * FROM star_t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(got == Seq(("a", 2, 20), ("b", 3, 5)), got.toString)
    // qualified star too
    val got2 = QualifySql.sql(spark,
      "SELECT star_t.*, v + 1 AS vp FROM star_t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1")
      .columns.toSeq
    assert(got2 == Seq("k", "v", "w", "vp"), got2.toString)
  }

  test("star-EXCEPT detection sees through comments between * and EXCEPT") {
    import spark.implicits._
    Seq(("k1", 1, "u"), ("k1", 2, "u"), ("k2", 9, "u"))
      .toDF("k", "v", "src").createOrReplaceTempView("cmt_a")
    Seq(("k1", 7, "w"), ("k2", 3, "w"))
      .toDF("k", "v", "src").createOrReplaceTempView("cmt_b")
    // block comment between the star and EXCEPT: still a projection modifier
    val blk = QualifySql.sql(spark,
      "SELECT * /* drop src */ EXCEPT (src) FROM cmt_a " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
    assert(blk.columns.toSeq == Seq("k", "v"), blk.columns.mkString(","))
    assert(blk.count() == 2)
    // line comment too
    val ln = QualifySql.sql(spark,
      "SELECT * -- drop src\nEXCEPT (src) FROM cmt_a " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1")
    assert(ln.columns.toSeq == Seq("k", "v"), ln.columns.mkString(","))
    // a set-op EXCEPT preceded by a comment still splits branches
    val setExc = QualifySql.sql(spark,
      """SELECT k FROM cmt_a /* minus b's best */ EXCEPT
        |SELECT k FROM cmt_b QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(setExc == Seq("k2"), setExc.toString)
  }
}
