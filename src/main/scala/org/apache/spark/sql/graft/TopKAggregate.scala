package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k (score, id) per group as a partial-aggregable aggregate.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY s
  * DESC)` then `rk <= k`) must shuffle and sort EVERY candidate row. This
  * aggregate keeps a bounded k-buffer per group on the map side, so an n²
  * candidate stream (e.g. brute-force k-NN) collapses to k rows per group
  * before the exchange — the shuffle carries k·|groups| rows instead of n².
  *
  * Ordering contract: score DESC, id ASC (ties) — identical to the window
  * form it replaces, so results stay oracle-comparable.
  *
  * Output: array<struct<score:double, id:bigint>> sorted by that order;
  * posexplode gives back (rank-1, struct).
  */
case class TopKScoreId(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_score_id"

  // java.lang.Double.compare, not `>`: IEEE comparisons make NaN
  // incomparable (better(a,b) and better(b,a) both false), which breaks
  // sortWith's strict-weak-order contract (TimSort can throw) and
  // diverges from the window form, whose sort treats NaN as largest.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** Keep the buffer small: trim to k whenever it doubles past k. */
  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (buf.length <= 2 * k) buf
    else {
      val kept = buf.sortWith(better).take(k)
      buf.clear(); buf ++= kept
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      trim(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)], b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    trim(b1)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortWith(better).take(k)
      .map(t => InternalRow(t._1, t._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** String-id variant of [[TopKScoreId]]: exact top-k (score DESC, id ASC
  * by binary string order — matching both engines' default collation on
  * ASCII) with the same bounded map-side buffer. Exists for ranked-term
  * outputs (TF-IDF top terms) where the id is a token, not a key. */
case class TopKScoreStr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, org.apache.spark.unsafe.types.UTF8String)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")
  private type S = org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", StringType))))
  override def prettyName: String = "topk_score_str"

  // see TopKScoreId.better: total order via Double.compare (NaN-safe)
  private def better(a: (Double, S), b: (Double, S)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2.compareTo(b._2) < 0)
  }

  private def trim(buf: ArrayBuffer[(Double, S)]): ArrayBuffer[(Double, S)] =
    if (buf.length <= 2 * k) buf
    else {
      val kept = buf.sortWith(better).take(k)
      buf.clear(); buf ++= kept
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, S)] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, S)], input: InternalRow): ArrayBuffer[(Double, S)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // clone: the eval result may point into a reused row buffer
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[S].clone()))
      trim(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, S)], b2: ArrayBuffer[(Double, S)]): ArrayBuffer[(Double, S)] = {
    b1 ++= b2
    trim(b1)
  }

  override def eval(buf: ArrayBuffer[(Double, S)]): Any =
    new GenericArrayData(buf.sortWith(better).take(k)
      .map(t => InternalRow(t._1, t._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, S)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      val bytes = i.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, S)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, S)](n)
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((s, org.apache.spark.unsafe.types.UTF8String.fromBytes(b)))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Column-level entry points for graft aggregate expressions. */
object aggregates {
  /** Exact top-k (score DESC, id ASC) per group; returns
    * array<struct<score,id>> — posexplode for ranked rows. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.lift(
      TopKScoreId(ColumnBridge.unwrap(score), ColumnBridge.unwrap(id), k)
        .toAggregateExpression())

  /** Same contract with a string id (score DESC, id ASC binary order). */
  def topKByScoreStr(score: Column, id: Column, k: Int): Column =
    ColumnBridge.lift(
      TopKScoreStr(ColumnBridge.unwrap(score), ColumnBridge.unwrap(id), k)
        .toAggregateExpression())
}
