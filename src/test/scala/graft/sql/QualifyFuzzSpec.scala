package graft.sql

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property fuzz for the hand-rolled [[QualifySql]] tokenizer/rewriter
  * (round-14, VERDICT item 5 — same discipline as the q310/q334 mutant
  * harnesses: a generated corpus is only evidence if a seeded naive
  * mutant demonstrably fails on it).
  *
  * A seeded generator composes SELECT statements from independent parts —
  * select lists (plain, aliased, bare-alias, unaliased-expression, star,
  * star-EXCEPT), FROM subqueries, WHERE clauses whose string literals
  * contain `QUALIFY`/`UNION`/`* EXCEPT` text, line/block comments
  * carrying keywords, three window-predicate families, trailing
  * ORDER BY/LIMIT, and top-level set operations — and emits each
  * statement TWICE: the QUALIFY form (shim input) and a desugared form
  * built directly from the parts the generator chose (the oracle: it
  * never re-parses, so it cannot share a lexer bug with the shim). The
  * property: the shim's rewrite parses and returns row-identical results
  * to the oracle on every statement, and statements whose only QUALIFY
  * tokens live in strings/comments pass through byte-identical.
  *
  * The mutant: the regex-flavored rewriter the token scanner exists to
  * replace (finds QUALIFY by plain indexOf, ends the predicate at the
  * first ORDER/LIMIT substring — quoting, comments, and OVER(...) depth
  * all invisible). The corpus must make it diverge — parse failure or
  * wrong rows — on the hostile-literal, comment, and windowed-ORDER-BY
  * statements; a corpus the mutant survives is a fixture, not a fuzz. */
class QualifyFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val view: String = {
    val rng = new scala.util.Random(0x9A71F9L)
    val rows = for {
      k <- Seq("a", "b", "c", "d", "e")
      i <- 1 to 8
    } yield (k, rng.nextInt(40), i * 10 + rng.nextInt(9), // ts unique per k
      Seq("plain", "QUALIFY x UNION y", "-- QUALIFY", "* EXCEPT (v)",
        "O'Brien QUALIFY")(rng.nextInt(5)))
    rows.toDF("k", "v", "ts", "s").createOrReplaceTempView("qfz")
    "qfz"
  }

  /** One SELECT branch: the QUALIFY form's pieces plus the ground-truth
    * outer projection the generator knows by construction. */
  private case class Part(list: String, outer: String, from: String,
      where: Option[String], pred: Option[String])

  private def gen(rng: scala.util.Random): Part = {
    val lists = Seq(
      ("k, v, ts", "SELECT k, v, ts"),
      ("k, v + 1 AS v1, ts", "SELECT k, v1, ts"),
      ("upper(k) uk, ts", "SELECT uk, ts"),
      ("k AS kk, ts, v", "SELECT kk, ts, v"),
      ("*", "SELECT * EXCEPT (__qualify)"),
      ("k, v * 2, ts", "SELECT * EXCEPT (__qualify)"), // unaliased expr
      ("* EXCEPT (s)", "SELECT * EXCEPT (__qualify)")) // star-EXCEPT list
    val (list, outer) = lists(rng.nextInt(lists.size))
    val from = Seq(view,
      s"(SELECT k, v, ts, s FROM $view WHERE v >= 0) t0")(rng.nextInt(2))
    val where = Seq(None, Some("v > 3"),
      Some("s <> 'QUALIFY x UNION y'"),           // hostile literal
      Some("s <> \"* EXCEPT (v)\""))(rng.nextInt(4)) // double-quoted too
    val pred = Seq(
      Some("row_number() OVER (PARTITION BY k ORDER BY ts DESC, v DESC) = 1"),
      Some("rank() OVER (PARTITION BY k ORDER BY ts DESC) <= 2"),
      Some("count(*) OVER (PARTITION BY k) > 6"),
      None)(rng.nextInt(4))
    Part(list, outer, from, where, pred)
  }

  private def trivia(rng: scala.util.Random): String = Seq("",
    " /* QUALIFY UNION EXCEPT ORDER */ ",
    " -- SELECT QUALIFY LIMIT\n ")(rng.nextInt(3))

  /** The QUALIFY-form text of one branch, with keyword-bearing trivia
    * sprinkled between clauses. */
  private def qualifyForm(p: Part, rng: scala.util.Random): String = {
    val w = p.where.map(c => s" WHERE ${trivia(rng)}$c").getOrElse("")
    val q = p.pred.map(c => s" QUALIFY ${trivia(rng)}$c").getOrElse("")
    s"SELECT ${trivia(rng)}${p.list} FROM ${p.from}$w$q"
  }

  /** The oracle desugar, assembled from the same parts — never parsed. */
  private def desugared(p: Part): String = {
    val w = p.where.map(c => s" WHERE $c").getOrElse("")
    p.pred match {
      case None => s"SELECT ${p.list} FROM ${p.from}$w"
      case Some(pred) =>
        s"${p.outer} FROM (SELECT ${p.list}, ($pred) AS __qualify " +
          s"FROM ${p.from}$w) __o WHERE __qualify"
    }
  }

  private def rows(sqlText: String): Seq[String] = {
    val df = spark.sql(sqlText)
    df.select(df.columns.sorted.map(col): _*)
      .collect().map(_.toString).toSeq.sorted
  }

  /** The seeded naive mutant: plain-substring QUALIFY/clause detection. */
  private def mutantRewrite(text: String): String = {
    val qi = text.indexOf("QUALIFY")
    if (qi < 0) return text
    val tailCands = Seq("ORDER", "LIMIT")
      .map(kw => text.indexOf(kw, qi + 7)).filter(_ >= 0)
    val tailPos = if (tailCands.isEmpty) text.length else tailCands.min
    val pred = text.substring(qi + 7, tailPos).trim
    val tail = if (tailPos >= text.length) "" else " " + text.substring(tailPos)
    val head = text.substring(0, qi)
    val fi = head.indexOf("FROM")
    val list = head.substring("SELECT".length, if (fi < 0) head.length else fi)
    val body = if (fi < 0) "" else head.substring(fi)
    s"SELECT * EXCEPT (__qualify) FROM (SELECT $list, ($pred) AS __qualify " +
      s"$body) __m WHERE __qualify$tail"
  }

  test("200 generated statements: shim parses and matches the constructed oracle") {
    view
    val rng = new scala.util.Random(0xF0221L)
    var mutantDiverged = 0
    var passThrough = 0
    var rewritten = 0
    (1 to 200).foreach { i =>
      val a = gen(rng)
      // ~40%: a top-level set operation of two branches
      val (qf, or) = if (rng.nextInt(5) < 2) {
        val b = gen(rng)
        val op = Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT")(rng.nextInt(4))
        // trailing sort/limit over the whole set-op; LIMIT is kept
        // semantics-neutral (≥ any result size) so the row compare can
        // never hinge on a tie at the cut — the clause handling is what
        // is under test, not the cut
        val tail = Seq("", " ORDER BY 1, 2", " ORDER BY 1, 2 LIMIT 1000")(rng.nextInt(3))
        (s"${qualifyForm(a, rng)} $op ${qualifyForm(b, rng)}$tail",
          s"${desugared(a)} $op ${desugared(b)}$tail")
      } else {
        val tail = Seq("", " ORDER BY 1", " ORDER BY 1, 2 LIMIT 1000")(rng.nextInt(3))
        (s"${qualifyForm(a, rng)}$tail", s"${desugared(a)}$tail")
      }
      // set-op INTERSECT/EXCEPT over star lists with mismatched widths
      // would fail in BOTH forms identically — still a valid property run
      val got =
        try QualifySql.rewrite(qf)
        catch { case e: IllegalArgumentException =>
          fail(s"statement $i: shim crashed on\n  $qf\n  ${e.getMessage}") }
      val hasTopQualify = got != qf
      if (hasTopQualify) rewritten += 1 else passThrough += 1
      val (oracleRows, oracleErr) =
        try (rows(or), false) catch { case _: Exception => (Nil, true) }
      if (oracleErr) {
        // both engines must reject identically-shaped nonsense
        assertThrows[Exception](rows(got))
      } else {
        assert(rows(got) == oracleRows,
          s"statement $i diverged\n  qualify: $qf\n  rewrite: $got\n  oracle:  $or")
      }
      // the mutant under the same statement: count real divergences
      if (!oracleErr && qf.contains("QUALIFY")) {
        val m = mutantRewrite(qf)
        val diverged =
          try rows(m) != oracleRows catch { case _: Exception => true }
        if (diverged) mutantDiverged += 1
      }
    }
    assert(rewritten > 60, s"generator degenerate: only $rewritten rewrites")
    assert(passThrough > 10, s"generator degenerate: only $passThrough pass-throughs")
    // the corpus is only evidence because the naive rewriter fails on it
    assert(mutantDiverged > 10,
      s"mutant survived the corpus ($mutantDiverged divergences) — " +
        "hostile statements are not actually hostile")
  }

  test("QUALIFY only in strings/comments: byte-identical pass-through, mutant breaks") {
    view
    val stmts = Seq(
      s"SELECT k, s FROM $view WHERE s = 'QUALIFY x UNION y' ORDER BY k, s",
      s"SELECT k /* QUALIFY rank() OVER (ORDER BY v) = 1 */, v FROM $view ORDER BY k, v",
      s"SELECT k, v -- QUALIFY noise\n FROM $view ORDER BY k, v",
      s"SELECT `QUALIFY`.k, v FROM $view AS `QUALIFY` ORDER BY k, v")
    stmts.foreach { t =>
      assert(QualifySql.rewrite(t) eq t, s"pass-through must be identity: $t")
      val want = rows(t)
      assert(rows(t) == want) // and executable
      val m = mutantRewrite(t)
      val mutantDiverged = try rows(m) != want catch { case _: Exception => true }
      assert(mutantDiverged, s"mutant must corrupt the quoted/commented form: $t")
    }
  }
}
