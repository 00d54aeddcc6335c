package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-style merge application over a token array: the APPLY half of
  * tokenizer induction (q144 mines the merge table; this encodes with it).
  *
  * `merges` is the learned rule list in PRIORITY ORDER (rank 0 = most
  * frequent pair), as a foldable array<struct<a,b>> literal — the
  * broadcast-rules shape: the table is driver-built from a bounded
  * aggregate (top-R pairs), embedded as a literal, and every executor
  * applies it row-locally. Tokenization is embarrassingly parallel — zero
  * shuffle — which is exactly how it must run at 100 TB.
  *
  * Semantics: standard greedy BPE — repeatedly merge the best-ranked
  * adjacent pair present, all its occurrences left-to-right, until no
  * rule applies; a merged token is `a + " " + b`. Two deliberate
  * restrictions keep the semantics engine-portable and exactly
  * oracle-checkable:
  *
  *   1. Rules are SINGLE-LEVEL (both sides are corpus words, never merged
  *      tokens). A merged token contains a space and corpus words do not,
  *      so applying one rule can never create an occurrence of another —
  *      rules only destroy occurrences. Best-first rounds are therefore
  *      order-equivalent to applying each rule EXHAUSTIVELY in rank
  *      order, which is what eval does (one linear pass per rule).
  *   2. Self-pairs (a = b) are excluded from the rule table: left-to-right
  *      non-overlap on an odd run ("a a a") is tokenizer-implementation-
  *      defined, and with a ≠ b adjacent occurrences cannot overlap at
  *      all, so the pass semantics are unambiguous.
  *
  * Native expression for the same reason as [[SimHashBits]]: the
  * equivalent nested `aggregate × transform × filter` lambda stack runs
  * interpreted per rule per token; here it is rules × one array pass in
  * one compiled call per row.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), AnyDataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_encode"

  // The rule table is a query constant: parse the literal once per
  // expression instance, not per row. Evaluated lazily so the instance
  // survives serialization (the literal re-evals on the executor).
  @transient private lazy val rules: Array[(UTF8String, UTF8String)] = {
    require(right.foldable, "bpe_encode merges must be a literal rule table")
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val out = new Array[(UTF8String, UTF8String)](arr.numElements())
    var i = 0
    while (i < out.length) {
      val st = arr.getStruct(i, 2)
      val a = st.getUTF8String(0)
      val b = st.getUTF8String(1)
      require(a != null && b != null && !a.equals(b),
        s"bpe_encode rules must be non-null with a != b, got ($a, $b)")
      // The best-first == rank-order-exhaustive equivalence proof assumes
      // SINGLE-LEVEL rules: merged tokens are joined with a space, so a
      // rule side containing a space could only match a previously merged
      // pair — multi-level semantics this operator does not implement.
      // Reject loudly instead of silently producing neither semantics.
      require(!a.contains(space) && !b.contains(space),
        s"bpe_encode rule sides must not contain the merge separator " +
          s"(space): got ($a, $b) — multi-level merge tables are unsupported")
      out(i) = (a, b)
      i += 1
    }
    out
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(toks: Any, mergesIgnored: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cur = new Array[UTF8String](n)
    var len = n
    var i = 0
    while (i < n) { cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    var r = 0
    while (r < rules.length && len > 1) {
      val (a, b) = rules(r)
      // one left-to-right pass merging every (a, b) occurrence in place
      var read = 0
      var write = 0
      while (read < len) {
        val t = cur(read)
        if (read + 1 < len && t != null && t.equals(a) &&
            cur(read + 1) != null && cur(read + 1).equals(b)) {
          cur(write) = UTF8String.concatWs(space, a, b)
          read += 2
        } else {
          cur(write) = t
          read += 1
        }
        write += 1
      }
      len = write
      r += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** TRUE multi-level BPE encode: merged tokens are the plain concatenation
  * a+b (no separator), so a rule's side may itself be a merged token and
  * applying one rule CAN create occurrences of another — the compound
  * vocabulary case [[BpeEncode]] deliberately rejects. Semantics are the
  * reference best-first loop every production tokenizer implements:
  * repeat { find the LOWEST-RANK rule with an occurrence; merge all its
  * occurrences in one left-to-right pass } until nothing applies. Each
  * application shortens the array, so the loop terminates in < len
  * applications; each application is one O(rules·len) scan — still pure
  * per-row compute, zero shuffle, rules broadcast as a literal.
  *
  * Unlike the single-level encoder there is NO rank-order-exhaustive
  * shortcut: after (a,b)→ab fires, a better-ranked (ab,c) may become
  * applicable, so the scan must re-search from the best rank each round.
  * Self-pairs stay excluded (left-to-right non-overlap on odd runs is
  * implementation-defined). */
case class BpeEncodeMulti(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), AnyDataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_encode_multi"

  @transient private lazy val rules: Array[(UTF8String, UTF8String)] = {
    require(right.foldable, "bpe_encode_multi merges must be a literal rule table")
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val out = new Array[(UTF8String, UTF8String)](arr.numElements())
    var i = 0
    while (i < out.length) {
      val st = arr.getStruct(i, 2)
      val a = st.getUTF8String(0)
      val b = st.getUTF8String(1)
      require(a != null && b != null && !a.equals(b),
        s"bpe_encode_multi rules must be non-null with a != b, got ($a, $b)")
      out(i) = (a, b)
      i += 1
    }
    out
  }

  override def nullSafeEval(toks: Any, mergesIgnored: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cur = new Array[UTF8String](n)
    var len = n
    var i = 0
    while (i < n) { cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    var done = len <= 1
    while (!done) {
      // best-first: the lowest-rank rule with at least one occurrence
      var best = -1
      var r = 0
      while (r < rules.length && best < 0) {
        val (a, b) = rules(r)
        var j = 0
        while (j + 1 < len && best < 0) {
          if (cur(j) != null && cur(j).equals(a) &&
              cur(j + 1) != null && cur(j + 1).equals(b)) best = r
          j += 1
        }
        r += 1
      }
      if (best < 0) done = true
      else {
        val (a, b) = rules(best)
        val merged = UTF8String.concat(a, b)
        var read = 0
        var write = 0
        while (read < len) {
          val t = cur(read)
          if (read + 1 < len && t != null && t.equals(a) &&
              cur(read + 1) != null && cur(read + 1).equals(b)) {
            cur(write) = merged
            read += 2
          } else {
            cur(write) = t
            read += 1
          }
          write += 1
        }
        len = write
        done = len <= 1
      }
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ONE left-to-right merge pass of a single rule (a, b) → concat(a+b)
  * over a token array — the per-round state update of the textbook BPE
  * TRAINING loop (Sennrich et al. 2016): after each round adopts its
  * best pair, the corpus advances by exactly one such pass. Kept
  * separate from [[BpeEncodeMulti]] deliberately: training state is
  * defined INCREMENTALLY (apply only the newest rule to the previous
  * round's state, never re-search earlier ranks), which differs from
  * best-first re-encoding exactly in the adversarial token-collision
  * case — see [[graft.text.BpeTrain]] for the contract.
  *
  * With a ≠ b (enforced), occurrences of (a, b) cannot overlap, so the
  * simultaneous-merge formulation an oracle replays equals this
  * left-to-right pass, and the number of merges equals the mined pair
  * count. Native for the hot-loop reason of the siblings: the trainer
  * stacks k of these over the cached base corpus and Catalyst collapses
  * them into one projection — each round is a single compiled pass per
  * row, zero shuffle.
  */
case class BpeMergePass(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_pass"

  @transient private lazy val rule: (UTF8String, UTF8String) = {
    require(second.foldable && third.foldable,
      "bpe_merge_pass rule sides must be literals")
    val a = second.eval(InternalRow.empty).asInstanceOf[UTF8String]
    val b = third.eval(InternalRow.empty).asInstanceOf[UTF8String]
    require(a != null && b != null && !a.equals(b),
      s"bpe_merge_pass rule must be non-null with a != b, got ($a, $b)")
    (a, b)
  }

  override def nullSafeEval(toks: Any, aIgnored: Any, bIgnored: Any): Any = {
    val (a, b) = rule
    val merged = UTF8String.concat(a, b)
    val arr = toks.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n)
    var read = 0
    var write = 0
    while (read < n) {
      val t = cur(read)
      if (read + 1 < n && t != null && t.equals(a) &&
          cur(read + 1) != null && cur(read + 1).equals(b)) {
        out(write) = merged
        read += 2
      } else {
        out(write) = t
        read += 1
      }
      write += 1
    }
    val trimmed = new Array[Any](write)
    System.arraycopy(out, 0, trimmed, 0, write)
    new GenericArrayData(trimmed)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level entry point. */
object bpe {
  /** Apply a rank-ordered merge table (array<struct<a,b>> literal) to an
    * array<string> token column. */
  def encode(tokens: Column, merges: Column): Column =
    ColumnBridge.lift(BpeEncode(ColumnBridge.unwrap(tokens), ColumnBridge.unwrap(merges)))

  /** Rank-ordered rule pairs as a Scala Seq (driver-collected bounded
    * top-R table) — embedded as an array<struct> literal. */
  def encode(tokens: Column, merges: Seq[(String, String)]): Column =
    encode(tokens, org.apache.spark.sql.functions.typedLit(merges))

  /** TRUE multi-level BPE (merged token = a+b, compound rules allowed) —
    * see [[BpeEncodeMulti]]. */
  def encodeMulti(tokens: Column, merges: Column): Column =
    ColumnBridge.lift(BpeEncodeMulti(ColumnBridge.unwrap(tokens), ColumnBridge.unwrap(merges)))

  def encodeMulti(tokens: Column, merges: Seq[(String, String)]): Column =
    encodeMulti(tokens, org.apache.spark.sql.functions.typedLit(merges))

  /** One training-round merge pass: every adjacent (a, b) → a+b, one
    * left-to-right sweep — see [[BpeMergePass]]. */
  def mergePass(tokens: Column, a: String, b: String): Column =
    ColumnBridge.lift(BpeMergePass(ColumnBridge.unwrap(tokens),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(a), StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(b), StringType)))
}
