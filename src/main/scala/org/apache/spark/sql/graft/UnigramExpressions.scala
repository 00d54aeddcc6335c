package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation — the INFERENCE step of a
  * SentencePiece-style unigram tokenizer (Kudo 2018), and the
  * globally-optimal counterpart to the greedy BPE family
  * ([[BpeExpressions]]): given a weighted piece vocabulary, split the
  * string into the piece sequence MAXIMIZING the total score by dynamic
  * programming over positions, instead of applying merges greedily.
  *
  * Exact-integer contract (what the DuckDB oracle replays round by
  * round):
  *  - score(piece) = weight(piece) · len(piece)², all Long;
  *  - best(0) = 0; best(k) = max over L in 1..4 with the length-L
  *    suffix piece in the vocabulary of best(k−L) + score;
  *  - ties prefer the LONGER final piece (the kernel scans L descending
  *    and replaces only on strictly-greater score — same rule as the
  *    oracle's `ORDER BY score DESC, L DESC` argmax);
  *  - equal (score, L) candidates are impossible: same L means the same
  *    piece and the same unique predecessor row.
  * Any character present in the vocabulary as a 1-gram keeps every
  * position reachable; the caller derives the vocabulary from the same
  * corpus, so segmentation is total by construction (a gap would return
  * null, surfacing the contract violation instead of masking it).
  *
  * The vocabulary rides the expression node via `ctx.addReferenceObj`
  * (one shared map per task binary, ≲ a few KB for the top-K + alphabet
  * vocabularies the gates use) — per-row work is an O(len·4) DP on a
  * shared immutable map, codegen'd as a single static kernel call like
  * [[JaroWinkler]]. */
object UnigramViterbi {
  /** DP kernel; returns (segments, totalScore) or null when some prefix
    * is unreachable with the given vocabulary. */
  def segment(str: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long]): InternalRow = {
    val s = str.toString
    val n = s.length
    val best = new Array[Long](n + 1)
    val from = new Array[Int](n + 1) // winning piece length at position k
    java.util.Arrays.fill(from, -1)
    from(0) = 0
    var k = 1
    while (k <= n) {
      var bestScore = Long.MinValue
      var bestL = -1
      var l = math.min(4, k)
      while (l >= 1) { // descending: strict replace prefers the longer piece
        if (from(k - l) >= 0) {
          val w = vocab.get(s.substring(k - l, k))
          if (w != null) {
            val sc = best(k - l) + w.longValue() * l * l
            if (sc > bestScore) { bestScore = sc; bestL = l }
          }
        }
        l -= 1
      }
      if (bestL > 0) { best(k) = bestScore; from(k) = bestL }
      k += 1
    }
    if (from(n) < 0) return null
    var pieces = List.empty[UTF8String]
    var pos = n
    var np = 0
    while (pos > 0) {
      val l = from(pos)
      pieces = UTF8String.fromString(s.substring(pos - l, pos)) :: pieces
      np += 1
      pos -= l
    }
    InternalRow(new GenericArrayData(pieces.toArray[Any]), best(n), np)
  }
}

/** Column-level unigram Viterbi segmentation. Returns
  * struct<pieces array<string>, score bigint, n_pieces int>. */
case class UnigramViterbiSeg(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false)),
    StructField("score", LongType),
    StructField("n_pieces", IntegerType)))
  // Can return null for NON-null input (a string with no total
  // segmentation under the vocabulary), so the output is nullable even
  // over a non-nullable child. Without this override,
  // UnaryExpression's nullSafeCodeGen would emit `isNull` as the
  // literal `false` for a non-nullable child and the generated
  // `false = (value == null)` assignment fails to compile (interpreted
  // fallback), while the optimizer wrongly assumes non-null output.
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi_seg"

  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, w) => m.put(p, java.lang.Long.valueOf(w)) }
    m
  }

  /** Codegen entry point (referenced via addReferenceObj, q310 pattern). */
  def segmentRow(input: Any): Any =
    UnigramViterbi.segment(input.asInstanceOf[UTF8String], vocabMap)

  override def nullSafeEval(input: Any): Any = segmentRow(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this,
      classOf[UnigramViterbiSeg].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.segmentRow($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column entry points for unigram-tokenizer expressions. */
object unigram {
  def viterbiSeg(col: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.lift(UnigramViterbiSeg(ColumnBridge.unwrap(col), vocab))
}
