package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 32-bit frequency-weighted SimHash over a token array, as one compiled
  * per-row call.
  *
  * Semantics are bit-for-bit the md5-nibble formulation the DuckDB oracle
  * uses: token → md5 → 32 hex nibbles; bit b votes +1 if nibble b ≥ 8 else
  * −1 (weighted by token multiplicity); the signature sets bit b when its
  * vote sum is ≥ 0.
  *
  * Exists because the pure-SQL formulation — nested `aggregate()` lambdas
  * over `substr(md5(t), b, 1)` — is evaluated by the interpreted
  * higher-order-function path: tokens × 32 lambda frames per row made it
  * the slowest query in the bench by far. Here the whole signature is one
  * tight loop over the digest bytes (~tokens × 32 integer ops), with the
  * MD5 instance reused across rows.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  // Thread-confined: expression instances are usually task-local after
  // deserialization, but driver-side eval / reused interpreted projections
  // can share one instance across threads — a shared MessageDigest would
  // silently corrupt digests rather than fail loudly.
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private def md: MessageDigest = mdLocal.get()

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var bp = 0
        while (bp < 32) {
          val b = digest(bp >> 1) & 0xff
          val nib = if ((bp & 1) == 0) b >>> 4 else b & 0xf
          votes(bp) += (if (nib >= 8) 1 else -1)
          bp += 1
        }
      }
      i += 1
    }
    var h = 0L
    var bp = 0
    while (bp < 32) {
      if (votes(bp) >= 0) h |= 1L << bp
      bp += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for native text expressions. */
object text {
  /** 32-bit SimHash of an array<string> token column. */
  def simhash32(tokens: Column): Column =
    ColumnBridge.lift(SimHash32(ColumnBridge.unwrap(tokens)))
}
