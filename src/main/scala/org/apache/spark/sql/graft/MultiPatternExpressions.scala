package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Aho–Corasick multi-pattern counter: ALL (overlapping included)
  * occurrences of every pattern in one linear pass over the text —
  * O(|text| + matches) per row regardless of pattern count, versus one
  * regexp/substring scan PER pattern (the only composition Spark's
  * built-ins offer, O(|patterns|·|text|)). The automaton (goto/fail/output
  * links, Aho & Corasick 1975) is built once per expression instance from
  * the literal pattern list and shared across rows; the expression node in
  * the task binary carries only the pattern strings.
  *
  * Matching is over UTF-16 code units of the decoded string — identical
  * to byte-wise matching for ASCII corpora. Returns one count per pattern,
  * in pattern order; null text yields null.
  */
case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "ahocorasick_counts needs at least one non-empty pattern")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ahocorasick_counts"

  // goto as per-node char maps (tiny alphabets here); fail links; output
  // pattern-ids accumulated through fail chains so every match reports at
  // its end position.
  @transient private lazy val (gotoMaps, failLink, outputs) = {
    val gm = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.foreach { ch =>
        st = gm(st).getOrElseUpdate(ch, {
          gm += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          gm.length - 1
        })
      }
      out(st) = pid :: out(st)
    }
    val fail = Array.fill(gm.length)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gm(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      gm(v).foreach { case (ch, u) =>
        var f = fail(v)
        while (f != 0 && !gm(f).contains(ch)) f = fail(f)
        fail(u) = if (gm(f).contains(ch) && gm(f)(ch) != u) gm(f)(ch) else 0
        out(u) = out(u) ++ out(fail(u))
        queue.enqueue(u)
      }
    }
    (gm.map(_.toMap).toArray, fail, out.map(_.toArray).toArray)
  }

  /** One automaton transition (fail-chain then goto). */
  private[graft] def stepState(state: Int, ch: Char): Int = {
    var st = state
    while (st != 0 && !gotoMaps(st).contains(ch)) st = failLink(st)
    gotoMaps(st).getOrElse(ch, 0)
  }
  /** Pattern ids whose match ends in this state. */
  private[graft] def outputsAt(state: Int): Array[Int] = outputs(state)

  /** One linear automaton walk; called from both eval and generated code. */
  def countsFor(text: UTF8String): ArrayData = {
    val s = text.toString
    val counts = new Array[Long](patterns.length)
    var st = 0
    var i = 0
    while (i < s.length) {
      st = stepState(st, s.charAt(i))
      val hits = outputs(st)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(t: Any): Any = countsFor(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", this,
      classOf[AhoCorasickCounts].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.countsFor($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Span-reporting variant of [[AhoCorasickCounts]]: every (overlapping)
  * match as a (pid, start, end) struct with 1-based INCLUSIVE character
  * offsets — `substr(text, start, end - start + 1)` equals the pattern,
  * which is what a redaction pass needs (counts say HOW MUCH PII, spans
  * say WHERE to cut). Same single-walk automaton; emission order is by
  * match end (consumers re-sort, nothing downstream depends on it). */
case class AhoCorasickSpans(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "ahocorasick_spans needs at least one non-empty pattern")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("end",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ahocorasick_spans"

  // share the counting automaton's structure through a private twin
  @transient private lazy val counter = AhoCorasickCounts(child, patterns)

  def spansFor(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var st = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      st = counter.stepState(st, ch)
      val hits = counter.outputsAt(st)
      var j = 0
      while (j < hits.length) {
        val pid = hits(j)
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](
            pid, i + 2 - patterns(pid).length, i + 1))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(t: Any): Any = spansFor(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acSpans", this,
      classOf[AhoCorasickSpans].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.spansFor($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column entry points for multi-pattern matching. */
object multipattern {
  /** Counts of every pattern (overlapping included) in one pass. */
  def ahoCorasickCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.lift(AhoCorasickCounts(ColumnBridge.unwrap(text), patterns))

  /** All match spans (pid, 1-based inclusive start/end) in one pass. */
  def ahoCorasickSpans(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.lift(AhoCorasickSpans(ColumnBridge.unwrap(text), patterns))
}
