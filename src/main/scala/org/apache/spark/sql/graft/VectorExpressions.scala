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

  /** Johnson–Lindenstrauss ±1 sign projection of a quantized (BIGINT)
    * vector — see [[JlSignProject]]. Returns
    * struct<p: array<bigint>, n2: bigint, pn2: bigint>. */
  def jlSignProject(qv: Column, m: Int, d: Int): Column =
    ColumnBridge.lift(JlSignProject(ColumnBridge.unwrap(qv), m, d))
}

/** Native Johnson–Lindenstrauss SIGN projection kernel (Achlioptas 2003):
  * projects a d-dim BIGINT-quantized vector to m dims through the
  * deterministic ±1 matrix whose (j, k) entry is bit 11 of the Knuth
  * multiplicative hash of the flattened cell index — the exact integer
  * recurrence the q300 oracle replays as its `sg` CTE:
  * `sign(j,k) = +1 iff (((j*d + k + 1) * 2654435761) % 2^32) / 2048 % 2 = 0`.
  *
  * One expression node instead of an unrolled m·d add/subtract column
  * chain: the unrolled form was codegen-friendly but made the serialized
  * task binary ~3 MiB (the tree itself), costing ~1.5 s of per-execution
  * task-broadcast overhead at gate scale; this kernel is a constant-size
  * node whose generated code is two tight primitive loops. Returns
  * struct(p = the m projections, n2 = Σ qv², pn2 = Σ p²) so the JL
  * distortion audit needs no second pass over the array.
  *
  * All arithmetic is exact BIGINT (inputs are 1e-6-lattice quantized, so
  * |qv_i| ≤ ~2^21 and |p_j| ≤ 64·2^21 < 2^27; pn2 sums 16 squares < 2^58 —
  * no overflow). Null arrays yield null; null ELEMENTS are not expected
  * (quantized embeddings are dense) and would NPE loudly rather than
  * silently skew the projection. */
case class JlSignProject(child: Expression, m: Int, d: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("p", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n2", LongType, nullable = false),
    StructField("pn2", LongType, nullable = false)))
  override def prettyName: String = "jl_sign_project"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), d)
    var n2 = 0L
    var k = 0
    while (k < n) { val v = x.getLong(k); n2 += v * v; k += 1 }
    val p = new Array[Long](m)
    var j = 0
    while (j < m) {
      var acc = 0L
      k = 0
      while (k < n) {
        val cell = ((j.toLong * d + k + 1) * 2654435761L) % 4294967296L
        acc += (if (cell / 2048 % 2 == 0) x.getLong(k) else -x.getLong(k))
        k += 1
      }
      p(j) = acc
      j += 1
    }
    var pn2 = 0L
    j = 0
    while (j < m) { pn2 += p(j) * p(j); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(p),
        n2, pn2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val cell = ctx.freshName("cell")
      val p = ctx.freshName("p")
      val n2 = ctx.freshName("n2")
      val pn2 = ctx.freshName("pn2")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $d);
         |long $n2 = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $x.getLong($i);
         |  $n2 += $v * $v;
         |}
         |long[] $p = new long[$m];
         |long $pn2 = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $cell = (((long) $j * $d + $i + 1) * 2654435761L) % 4294967296L;
         |    $acc += ($cell / 2048L % 2L == 0L) ? $x.getLong($i) : -$x.getLong($i);
         |  }
         |  $p[$j] = $acc;
         |  $pn2 += $acc * $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($p),
         |    $n2, $pn2});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
