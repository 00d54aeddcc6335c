package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering the graft native
  * functions for SQL use:
  *
  *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * or `.withExtensions(new GraftExtensions)` on the session builder. After
  * registration, `array_dot(a, b)`, `topk_score_id(score, id, k)`,
  * `topk_score_str(score, id, k)`, `word_shingles(tokens, n)`, and
  * `simhash_bits(tokens, nbits)` work in plain SQL text, with the same codegen/partial-agg behavior as the
  * Column API in graft.functions.
  */
object GraftFunctions {
  /** Runtime registration into an existing session (the extensions path
    * below only applies to sessions built after the config is set). */
  def register(spark: org.apache.spark.sql.classic.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot",
      args => ArrayDotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("topk_score_id",
      args => {
        require(args.length == 3, "topk_score_id(score, id, k) takes exactly 3 arguments")
        TopKScoreId(args(0), args(1), intLit(args(2), "topk_score_id: k"))
      }, "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      args => {
        require(args.length == 2, "word_shingles(tokens, n) takes exactly 2 arguments")
        WordShingles(args(0), intLit(args(1), "word_shingles: n"))
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash_bits",
      args => {
        require(args.length == 2, "simhash_bits(tokens, nbits) takes exactly 2 arguments")
        SimHashBits(args(0), intLit(args(1), "simhash_bits: nbits"))
      }, "built-in")
    reg.createOrReplaceTempFunction("topk_score_str",
      args => {
        require(args.length == 3, "topk_score_str(score, id, k) takes exactly 3 arguments")
        TopKScoreStr(args(0), args(1), intLit(args(2), "topk_score_str: k"))
      }, "built-in")
    reg.createOrReplaceTempFunction("cms_estimate",
      args => {
        require(args.length == 2, "cms_estimate(sketch, item) takes exactly 2 arguments")
        CmsEstimate(args(0), args(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      args => {
        require(args.length == 2, "bpe_encode(tokens, merges) takes exactly 2 arguments")
        BpeEncode(args(0), args(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("hindex_long",
      args => {
        require(args.length == 1, "hindex_long(values) takes exactly 1 argument")
        HIndexLong(args(0))
      }, "built-in")
    reg.createOrReplaceTempFunction("gram_matrix_long",
      args => {
        require(args.length == 1, "gram_matrix_long(vec) takes exactly 1 argument")
        GramMatrixLong(args(0))
      }, "built-in")
  }

  // integral literals only — a fractional literal (word_shingles(t, 2.9))
  // must error, not silently truncate to n=2
  private[graft] def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) if v.isValidInt => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => throw new IllegalArgumentException(
      s"$what is out of Int range: $v")
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Byte, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integral literal, got $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    register(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(IntervalJoinStrategy)
    ext.injectOptimizerRule(_ => GlobalScanRewrite)
    ext.injectOptimizerRule(_ => EpochNanosPredicatePushdown)
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot(a, b) takes exactly 2 arguments")
        ArrayDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(tokens, n) takes exactly 2 arguments")
        WordShingles(args(0), GraftFunctions.intLit(args(1), "word_shingles: n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_bits(tokens, nbits) takes exactly 2 arguments")
        SimHashBits(args(0), GraftFunctions.intLit(args(1), "simhash_bits: nbits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_score_str"),
      new ExpressionInfo(classOf[TopKScoreStr].getName, "topk_score_str"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_score_str(score, id, k) takes exactly 3 arguments")
        TopKScoreStr(args(0), args(1), GraftFunctions.intLit(args(2), "topk_score_str: k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_score_id"),
      new ExpressionInfo(classOf[TopKScoreId].getName, "topk_score_id"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_score_id(score, id, k) takes exactly 3 arguments")
        TopKScoreId(args(0), args(1), GraftFunctions.intLit(args(2), "topk_score_id: k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_estimate(sketch, item) takes exactly 2 arguments")
        CmsEstimate(args(0), args(1))
      }))
  }
}
