package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native (whole-stage-codegen'd) dot product over two double arrays.
  *
  * A Catalyst `Expression` rather than a UDF or `aggregate(zip_with(...))`
  * chain: higher-order functions are interpreted per element and box every
  * value, which made brute-force cosine k-NN the bench bottleneck. The
  * generated code is a tight primitive loop inside the surrounding
  * WholeStageCodegen stage — no boxing, no lambda dispatch.
  *
  * Accumulation is a strict left-to-right fold starting at 0.0, matching
  * the DuckDB oracle's `list_reduce(list_prepend(0.0, ...), +)` exactly, so
  * results stay bit-identical across engines.
  *
  * Null elements inside the arrays are not expected (embeddings are dense);
  * a null array yields null via the standard null-safe contract.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two double arrays — the PQ/IVF training
  * and ADC-table kernel. Same motivation and contract as [[ArrayDotProduct]]:
  * a strict left-to-right fold `acc += (a_i − b_i)²` starting at 0.0,
  * bit-identical to both the interpreted
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)` chain it
  * replaces and the DuckDB oracle's `list_reduce` formulation — swapping it
  * in changes nothing but the per-element interpretation overhead. */
case class ArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object vector {
  /** Dot product of two array<double> columns (array<float> auto-casts). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.lift(ArrayDotProduct(ColumnBridge.unwrap(a), ColumnBridge.unwrap(b)))

  /** Squared L2 distance of two array<double> columns. */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.lift(ArraySqDist(ColumnBridge.unwrap(a), ColumnBridge.unwrap(b)))

  /** L2 norm of an array<double> column. */
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Sign-bit LSH key: an integer whose bit j-1 is set iff
    * v[offset + j] >= 0 (1-based element access), for j in 1..width.
    * Shared by the q30 bucketer, q59's IVF cells, and Dedup.nearCosine's
    * bands. Dimensions past the end of the vector hash as sign-0:
    * try_element_at yields NULL out of bounds (a plain element_at would
    * THROW under ANSI mode, Spark 4's default), and NULL coalesces to a
    * negative sentinel. */
  def signBits(v: Column, offset: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    aggregate(
      transform(sequence(lit(1), lit(width)), j =>
        when(coalesce(try_element_at(v, j + lit(offset)), lit(-1d)) >= 0d,
          call_function("shiftleft", lit(1), j - lit(1))).otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)
  }
}
