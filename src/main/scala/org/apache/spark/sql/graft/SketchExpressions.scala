package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized Count-Min sketch (the binary produced
  * by Spark's built-in `count_min_sketch` aggregate): estimated occurrence
  * count of `item`, with the CMS guarantee estimate >= true count and
  * estimate <= true count + eps*N at the sketch's confidence.
  *
  * The sketch column normally arrives via a broadcast join of the 1-row
  * aggregate frame. Row accessors COPY binary values (`UnsafeRow.
  * getBinary` allocates per call), so a reference-identity check alone
  * never hits; the memo therefore falls back to content equality — an
  * O(len) memcmp against the cached bytes, thousands of times cheaper
  * than re-parsing the counter table — so each task pays one parse plus
  * one compare per row. (A genuinely per-row sketch column still works;
  * it re-parses whenever the bytes actually change.)
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  /** Content-memoized deserialization (public: called from codegen). */
  def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq cachedBytes) && !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch
  }

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any =
    sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
      // CountMinSketch hashes java.lang.String (not UTF8String): normalize
      // so probes use the same bytes the aggregate inserted
      .estimateCount(item.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sketch, item) =>
      s"${ev.value} = $ref.sketchFor($sketch).estimateCount($item.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for sketch probes. */
object sketches {
  /** Estimated count of string `item` in the serialized CMS `sketch`
    * (built with Spark's `count_min_sketch` aggregate and attached via a
    * broadcast join — see [[CmsEstimate]]'s memoization contract). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.lift(CmsEstimate(
      ColumnBridge.unwrap(sketch), ColumnBridge.unwrap(item)))
}
