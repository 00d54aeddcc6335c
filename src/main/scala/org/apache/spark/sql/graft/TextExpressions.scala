package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Frequency-weighted SimHash of `nbits` bits over a token array, as one
  * compiled per-row call.
  *
  * Semantics are bit-for-bit the md5-hex-digit formulation the DuckDB
  * oracle uses: token → md5 hex; bit b (0 ≤ b < nbits) reads hex digit
  * b/4, bit 3-(b%4) — i.e. the digest's bits in hex-string reading order,
  * MSB-first within each digit. Bit b votes +1 when set, −1 when clear
  * (weighted by token multiplicity); the signature sets bit b when its
  * vote sum is ≥ 0. nbits is capped at 63 so the signature stays inside a
  * signed 64-bit value in every engine (DuckDB raises on BIGINT 1<<63).
  *
  * Exists because the pure-SQL formulation — nested `aggregate()` lambdas
  * over `substr(md5(t), b, 1)` — is evaluated by the interpreted
  * higher-order-function path: tokens × nbits lambda frames per row made
  * it the slowest query in the bench by far. Here the whole signature is
  * one tight loop over the digest bytes, with the MD5 instance reused
  * across rows.
  */
case class SimHashBits(child: Expression, nbits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(nbits >= 1 && nbits <= 63, s"nbits must be in [1, 63], got $nbits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  // Thread-confined: expression instances are usually task-local after
  // deserialization, but driver-side eval / reused interpreted projections
  // can share one instance across threads — a shared MessageDigest would
  // silently corrupt digests rather than fail loudly.
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private def md: MessageDigest = mdLocal.get()

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](nbits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var bp = 0
        while (bp < nbits) {
          val by = digest(bp >> 3) & 0xff          // hex digits 2k,2k+1 live in byte k
          val nib = if ((bp & 4) == 0) by >>> 4 else by & 0xf // digit bp/4
          val bit = (nib >> (3 - (bp & 3))) & 1    // MSB-first within the digit
          votes(bp) += (if (bit == 1) 1 else -1)
          bp += 1
        }
      }
      i += 1
    }
    var h = 0L
    var bp = 0
    while (bp < nbits) {
      if (votes(bp) >= 0) h |= 1L << bp
      bp += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array, first-occurrence order —
  * semantically `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * t[i..i+n-1])))`, as one compiled per-row call.
  *
  * Exists for the same reason as [[SimHashBits]]: the higher-order-function
  * formulation runs every lambda frame interpreted — tokens x (concat +
  * element_at x n) per row made shingling dominate the near-dup queries
  * (q26/q27). Here it is one linear pass with a LinkedHashSet (preserves
  * array_distinct's keep-first order, so results are bit-identical).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = arr.numElements()
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i <= num - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for native text expressions. */
object text {
  /** nbits-bit SimHash of an array<string> token column (nbits <= 63). */
  def simhash(tokens: Column, nbits: Int): Column =
    ColumnBridge.lift(SimHashBits(ColumnBridge.unwrap(tokens), nbits))

  /** Distinct word n-gram shingles of an array<string> token column. */
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.lift(WordShingles(ColumnBridge.unwrap(tokens), n))
}
