package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact Gram matrix (XᵀX) of a quantized vector column as ONE
  * partial-aggregable aggregate: input is `array<long>` (a row vector,
  * pre-quantized to integers so sums are order-free), buffer is the
  * upper-triangle accumulator `g[idx(i,j)] += v[i]*v[j]`, merge is
  * elementwise addition. The d(d+1)/2-cell buffer lives on the map side,
  * so the exchange carries ONE triangle per partition instead of n·d
  * exploded rows — the same shuffle-collapse argument as [[TopKScoreId]],
  * and the only way a 64-dim gram over 10⁹ rows is one aggregation job
  * rather than a 2080-way self-join.
  *
  * Output: `array<long>` of length d(d+1)/2 in row-major upper-triangle
  * order ((0,0),(0,1)…(0,d−1),(1,1)…); pair (i,j), i ≤ j, sits at index
  * i*d − i(i−1)/2 + (j−i). Rows must share one dimension d (loud error
  * otherwise); null rows are skipped.
  */
case class GramMatrixLong(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "gram_matrix_long"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(-1, null)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val a = vec.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData].toLongArray()
    if (buf.d == -1) { buf.d = arr.length; buf.g = new Array[Long](arr.length * (arr.length + 1) / 2) }
    require(arr.length == buf.d,
      s"gram_matrix_long: inconsistent vector dims ${arr.length} vs ${buf.d}")
    var i = 0
    var idx = 0
    while (i < buf.d) {
      var j = i
      while (j < buf.d) {
        buf.g(idx) += arr(i) * arr(j)
        idx += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: GramBuffer, b2: GramBuffer): GramBuffer = {
    if (b2.d == -1) return b1
    if (b1.d == -1) { b1.d = b2.d; b1.g = b2.g; return b1 }
    require(b1.d == b2.d,
      s"gram_matrix_long: inconsistent vector dims ${b2.d} vs ${b1.d}")
    var k = 0
    while (k < b1.g.length) { b1.g(k) += b2.g(k); k += 1 }
    b1
  }

  override def eval(buf: GramBuffer): Any =
    if (buf.d == -1) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(buf.g.map(v => v: Any))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    if (buf.d != -1) buf.g.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    if (d == -1) new GramBuffer(-1, null)
    else {
      val g = new Array[Long](d * (d + 1) / 2)
      var k = 0
      while (k < g.length) { g(k) = in.readLong(); k += 1 }
      new GramBuffer(d, g)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

/** Mutable (dim, upper-triangle sums) pair; d == -1 means "no row seen". */
final class GramBuffer(var d: Int, var g: Array[Long])

object gram {
  /** Upper-triangle Gram sums of an `array<long>` vector column. */
  def gramMatrixLong(vec: Column): Column =
    ColumnBridge.lift(GramMatrixLong(ColumnBridge.unwrap(vec)).toAggregateExpression())
}
