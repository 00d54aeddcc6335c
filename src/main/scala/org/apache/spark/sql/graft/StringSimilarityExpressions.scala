package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-integer Jaro–Winkler similarity kernel.
  *
  * The canonical record-linkage metric (Winkler 1990), with the semantics
  * the DuckDB oracle's `jaro_winkler_similarity` implements — pinned
  * empirically against it:
  *   - match window `max(|a|,|b|)/2 - 1` (integer division, floor 0),
  *     greedy first-unmatched matching left to right;
  *   - transpositions `t = h / 2` with INTEGER division, where h is the
  *     number of positions at which the two matched-character sequences
  *     differ (h can be odd — a 3-cycle like "abcdef"/"bcadef" gives
  *     h = 3, and DuckDB floors: jaro = 0.9444…, not the 0.9166… a
  *     fractional t would give);
  *   - Winkler prefix boost `jw = jaro + l·0.1·(1 − jaro)` with
  *     `l = min(4, common prefix)`, applied only when `jaro > 0.7`
  *     (strictly — verified: "abcvwxyz"/"abcdefgh" with jaro 7/12 stays
  *     unboosted).
  *
  * The similarity is emitted as round-half-up PARTS PER MILLION computed
  * entirely in BIGINT rational arithmetic — jaro = num/den with
  * num = m²·(la+lb) + (m−t)·la·lb, den = 3·la·lb·m; the boost and the
  * ppm rounding are further exact integer transforms — so the gate hash
  * carries zero float tolerance and the oracle's double-valued
  * `round(jw * 1e6)` agrees everywhere the double is within half a ppm
  * of the rational (always, for name-length strings: denominators are
  * ≤ 30·la·lb·m, far too small to land mid-ppm).
  *
  * Comparison is over UTF-16 code units of the decoded string; for the
  * ASCII identifiers this engine matches on, that is byte-identical to
  * DuckDB's byte-wise comparison.
  */
object JaroWinkler {
  /** Jaro–Winkler similarity in exact round-half-up ppm (0..1000000). */
  def ppm(aStr: UTF8String, bStr: UTF8String): Long = {
    val a = aStr.toString
    val b = bStr.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1000000L
    if (la == 0 || lb == 0) return 0L
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && b.charAt(j) == a.charAt(i)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // h = positions where the matched sequences differ; t = h / 2 floored
    var h = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) h += 1
        j += 1
      }
      i += 1
    }
    val t = h / 2
    val mL = m.toLong
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
    // jwNum grows as ~30·L³: the 2000000·jwNum rounding step would wrap
    // Long past ~5–6k chars (and num/den themselves past ~600k). Branch
    // to BigInt rationals above a conservative combined-length bound —
    // same arithmetic, overflow-free at any length; the Long fast path
    // keeps name-length inputs allocation-free.
    if (la.toLong + lb > 4096) {
      val num = BigInt(mL) * mL * (la + lb) + BigInt(mL - t) * la * lb
      val den = BigInt(3L) * la * lb * mL
      val (jwNum, jwDen) =
        if (num * 10 > den * 7) (num * 10 + l * (den - num), den * 10)
        else (num, den)
      ((BigInt(2000000L) * jwNum + jwDen) / (jwDen * 2)).toLong
    } else {
      val num = mL * mL * (la + lb) + (mL - t) * la * lb
      val den = 3L * la * lb * mL
      // boost strictly above 0.7: 10·num > 7·den
      val (jwNum, jwDen) =
        if (10L * num > 7L * den) (10L * num + l * (den - num), 10L * den)
        else (num, den)
      (2000000L * jwNum + jwDen) / (2L * jwDen)
    }
  }
}

/** Column-level Jaro–Winkler ppm — a native BinaryExpression whose
  * generated code is a single static call into [[JaroWinkler.ppm]] (the
  * kernel is branch-heavy, so a JIT-compiled helper beats inlined source;
  * the expression node itself stays constant-size in the task binary). */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_ppm"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.ppm(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinkler.ppm($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column entry points for native string-similarity expressions. */
object stringsim {
  /** Jaro–Winkler similarity of two string columns in exact ppm. */
  def jaroWinklerPpm(a: Column, b: Column): Column =
    ColumnBridge.lift(JaroWinklerPpm(ColumnBridge.unwrap(a), ColumnBridge.unwrap(b)))
}
