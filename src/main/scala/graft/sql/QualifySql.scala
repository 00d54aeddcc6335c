package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-level QUALIFY shim: lets the reference's analyst SQL
  * (`sql/example_queries.sql:7-15` uses `QUALIFY row_number() OVER ... = 1`)
  * paste VERBATIM into an engine whose parser has no QUALIFY clause (OSS
  * Spark 4.x — SURVEY §7.4). The DataFrame rewrite
  * ([[graft.pipeline.AnalystQueries.latestSnapshot]]) stays the engine
  * default; this shim only closes the copy-paste gap.
  *
  * The rewrite is the standard QUALIFY desugaring:
  * {{{
  *   SELECT <list> FROM ... QUALIFY <pred> [ORDER BY ...] [LIMIT ...]
  *   -- becomes --
  *   SELECT <names> FROM (
  *     SELECT <list>, (<pred>) AS __qualify FROM ...
  *   ) __qualify_sub WHERE __qualify [ORDER BY ...] [LIMIT ...]
  * }}}
  * performed on TOKENS, not regexes: a linear scan tracks string/identifier
  * quoting, line and block comments, and parenthesis depth, so QUALIFY
  * inside a literal, a comment, or a subquery is never touched and the
  * top-level clause keywords are found reliably. Statements without a
  * top-level QUALIFY pass through unchanged.
  *
  * Scope: one QUALIFY per SELECT branch — a statement that is a top-level
  * set operation (`UNION`/`INTERSECT`/`EXCEPT`) splits on the set-op
  * keywords and each branch rewrites independently, so "latest per key
  * from A UNION ALL latest per key from B" pastes verbatim. The outer
  * projection uses the select list's own names when every item is a plain
  * column or aliased expression, and degrades to `SELECT * EXCEPT
  * (__qualify)` (parsed by OSS Spark 4.x) for star items or unaliased
  * expressions — the input schema never needs to be known at rewrite
  * time. The one case that stays rejected-by-Spark is duplicate output
  * names from multiple `t.*` expansions — ambiguous regardless of
  * QUALIFY. A set-op `EXCEPT` is distinguished from star-`EXCEPT` by the
  * preceding token (`*`).
  */
object QualifySql {

  /** Parse-rewrite-execute: `spark.sql` for QUALIFY-bearing statements. */
  def sql(spark: SparkSession, text: String): DataFrame =
    spark.sql(rewrite(text))

  /** The pure text→text rewrite (exposed for tests/inspection): splits a
    * top-level set operation into branches and rewrites each. Returns the
    * input object unchanged when no branch carries a QUALIFY. */
  def rewrite(text: String): String = {
    val toks = topLevelKeywords(text)
    if (!toks.exists(_._1 == "QUALIFY")) return text
    // set-op boundaries; an EXCEPT whose previous code char (comment- and
    // quote-aware, so `SELECT * /* note */ EXCEPT (c)` still sees the `*`)
    // is a star is star-EXCEPT (a projection modifier), not a set operation
    val bounds = toks.filter { case (kw, p) =>
      (kw == "UNION" || kw == "INTERSECT") ||
        (kw == "EXCEPT" && !lastCodeChar(text, p).contains('*'))
    }
    if (bounds.isEmpty) return rewriteSingle(text)
    // each separator consumes its keyword plus a following ALL/DISTINCT
    val cuts = bounds.map { case (kw, p) =>
      var e = p + kw.length
      while (e < text.length && text.charAt(e).isWhitespace) e += 1
      val w = text.substring(e).takeWhile(ch => ch.isLetter).toUpperCase(java.util.Locale.ROOT)
      if (w == "ALL" || w == "DISTINCT") e += w.length
      (p, e)
    }
    val sb = new StringBuilder
    var prev = 0
    for ((p, e) <- cuts) {
      sb.append(rewriteSingle(text.substring(prev, p)))
      // padding spaces keep rewritten branches (which trim their tails)
      // from abutting the set-op keyword
      sb.append(' ').append(text.substring(p, e)).append(' ')
      prev = e
    }
    sb.append(rewriteSingle(text.substring(prev)))
    sb.toString
  }

  /** The single-SELECT desugaring (no set operations in `text`). */
  private def rewriteSingle(text: String): String = {
    val toks = topLevelKeywords(text)
    val qualifies = toks.filter(_._1 == "QUALIFY")
    if (qualifies.isEmpty) return text
    require(qualifies.length == 1,
      "QualifySql: a SELECT cannot carry more than one QUALIFY clause")

    def at(kw: String): Option[Int] = toks.find(_._1 == kw).map(_._2)
    val selectPos = at("SELECT").getOrElse(
      throw new IllegalArgumentException("QualifySql: no top-level SELECT"))
    val fromPos = at("FROM").getOrElse(
      throw new IllegalArgumentException("QualifySql: no top-level FROM"))
    val qualifyPos = qualifies.head._2
    // everything after QUALIFY's predicate: the first top-level ORDER or
    // LIMIT that follows it (ORDER BY inside OVER(...) is depth > 0)
    val tailPos = toks.collect {
      case (kw, p) if (kw == "ORDER" || kw == "LIMIT") && p > qualifyPos => p
    }.sorted.headOption.getOrElse(text.length)

    val selectList = text.substring(selectPos + "SELECT".length, fromPos)
    val body = text.substring(fromPos, qualifyPos) // FROM ... WHERE ... etc
    val pred = text.substring(qualifyPos + "QUALIFY".length, tailPos).trim
      .stripSuffix(";")
    val tail = if (tailPos >= text.length) ""
      else " " + text.substring(tailPos).trim.stripSuffix(";")

    // star select lists and unaliased expressions can't be name-projected
    // without the input schema; strip the helper column with star-EXCEPT
    // instead (OSS Spark 4.x). Nameable lists keep the explicit
    // projection (a plan-identical outer SELECT of the original names).
    val outer = outputNames(selectList) match {
      case Some(names) => s"SELECT ${names.mkString(", ")}"
      case None => "SELECT * EXCEPT (__qualify)"
    }
    s"$outer FROM (SELECT $selectList, ($pred) AS __qualify " +
      s"$body) __qualify_sub WHERE __qualify$tail"
  }

  /** Top-level (depth-0, uncommented, unquoted) keyword occurrences in
    * source order, as (UPPERCASE keyword, position). */
  private def topLevelKeywords(text: String): Seq[(String, Int)] = {
    val kws = Set("SELECT", "FROM", "WHERE", "GROUP", "HAVING",
      "QUALIFY", "ORDER", "LIMIT", "UNION", "INTERSECT", "EXCEPT")
    val out = Seq.newBuilder[(String, Int)]
    var i = 0
    var depth = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      c match {
        case '\'' | '"' | '`' => // quoted string/identifier: skip to close
          val q = c
          i += 1
          while (i < n && text.charAt(i) != q) {
            if (text.charAt(i) == '\\' && q != '`') i += 1 // escaped char
            i += 1
          }
          i += 1
        case '-' if i + 1 < n && text.charAt(i + 1) == '-' => // line comment
          while (i < n && text.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && text.charAt(i + 1) == '*' => // block comment
          i += 2
          while (i + 1 < n && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
          i += 2
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c0 if Character.isLetter(c0) || c0 == '_' =>
          val start = i
          while (i < n && (Character.isLetterOrDigit(text.charAt(i)) || text.charAt(i) == '_')) i += 1
          val word = text.substring(start, i).toUpperCase(java.util.Locale.ROOT)
          if (depth == 0 && kws.contains(word)) out += word -> start
        case _ => i += 1
      }
    }
    out.result()
  }

  /** Last non-whitespace, non-comment character strictly before `p`,
    * under the same quote/comment lexing as [[topLevelKeywords]] — used
    * to tell star-`EXCEPT` from the set operation even with trivia
    * between the `*` and the keyword. */
  private def lastCodeChar(text: String, p: Int): Option[Char] = {
    var i = 0
    var last: Option[Char] = None
    while (i < p) {
      val c = text.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          val q = c
          last = Some(q)
          i += 1
          while (i < p && text.charAt(i) != q) {
            if (text.charAt(i) == '\\' && q != '`') i += 1
            i += 1
          }
          i += 1
        case '-' if i + 1 < p && text.charAt(i + 1) == '-' =>
          while (i < p && text.charAt(i) != '\n') i += 1
        case '/' if i + 1 < p && text.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < p && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
          i += 2
        case c0 if c0.isWhitespace => i += 1
        case c0 => last = Some(c0); i += 1
      }
    }
    last
  }

  /** Output names of the top-level-comma-separated select items: trailing
    * `AS name`, trailing bare alias, or the last segment of a (possibly
    * qualified) column path. None when any item is a star or an unaliased
    * expression — the caller then uses the star-EXCEPT projection. */
  private def outputNames(selectList: String): Option[Seq[String]] = {
    val items = splitTopLevel(selectList)
    require(items.nonEmpty, "QualifySql: empty select list")
    val names = items.map { raw =>
      val item = raw.trim
      if (item == "*" || item.endsWith(".*")) return None
      val words = item.split("\\s+")
      val asIdx = words.lastIndexWhere(_.equalsIgnoreCase("AS"))
      // a trailing identifier counts as a bare alias only when the item has
      // no depth-0 operator ("a + b" must not read as expr `a +` alias `b`)
      val hasTopLevelOp = {
        var depth = 0
        item.exists { ch =>
          if (ch == '(') { depth += 1; false }
          else if (ch == ')') { depth -= 1; false }
          else depth == 0 && "+-*/%<>=|&^".indexOf(ch) >= 0
        }
      }
      val cand =
        if (asIdx >= 0 && asIdx < words.length - 1) words.last
        else if (words.length > 1 && !hasTopLevelOp && words.last.forall(ch =>
          Character.isLetterOrDigit(ch) || ch == '_' || ch == '`')) words.last
        else if (words.length == 1) item.split('.').last
        else return None // unaliased expression: fall back to star-EXCEPT
      if (!cand.forall(ch => Character.isLetterOrDigit(ch) || ch == '_' || ch == '`'))
        return None // e.g. a parenthesized or function-call tail
      cand
    }
    Some(names)
  }

  /** Split on commas at parenthesis depth 0 (quote/comment-aware). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' | '`' =>
          val q = s.charAt(i); i += 1
          while (i < s.length && s.charAt(i) != q) {
            if (s.charAt(i) == '\\' && q != '`') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().filter(_.trim.nonEmpty)
  }
}
