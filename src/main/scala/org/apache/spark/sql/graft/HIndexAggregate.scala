package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types._

/** H-index of a group of non-negative longs: the largest h such that at
  * least h of the values are >= h — the neighborhood operator whose fixed
  * point is the k-core number (coreness) of every vertex at once
  * (Lü et al. 2016, "The H-index of a network node", Nature Comm. 7).
  *
  * Exists as a custom aggregate for the shuffle count: the window
  * formulation (row_number over values DESC, then max(min(rank, value)))
  * pays a per-group SORT and a second aggregation pass every coreness
  * round. This buffer is a value→count histogram — bounded by the number
  * of DISTINCT neighbor estimates, which is at most the group's degree
  * and in practice far smaller — and it is partial-combinable (histogram
  * addition), so each round of the coreness loop is ONE hash aggregate
  * with map-side combine, no sort anywhere.
  *
  * Deterministic: a pure multiset function — independent of row order,
  * partitioning, and merge order. NULL inputs are skipped; negative
  * values are clamped to 0 (they can never lift h).
  */
case class HIndexLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hindex_long"

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = math.max(0L, v.asInstanceOf[Long])
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (k, n) => b1.update(k, b1.getOrElse(k, 0L) + n) }
    b1
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    // h = max h with suffix-count(values >= h) >= h: walk values
    // descending, accumulating the count of values >= v; within a run the
    // best h is min(cum, v) and the global best is the max over runs.
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys)
    var h = 0L
    var cum = 0L
    var i = keys.length - 1
    while (i >= 0) {
      val v = keys(i)
      cum += buf(v)
      val cand = math.min(cum, v)
      if (cand > h) h = cand
      i -= 1
    }
    h
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) => out.writeLong(k); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Long, Long]
    var j = 0
    while (j < n) { buf.update(in.readLong(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HIndexLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HIndexLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Column-level entry point (see [[aggregates]] for the top-k family). */
object hindex {
  /** Group H-index of a long column: largest h with >= h values >= h. */
  def hIndex(values: Column): Column =
    ColumnBridge.lift(
      HIndexLong(ColumnBridge.unwrap(values)).toAggregateExpression())
}
