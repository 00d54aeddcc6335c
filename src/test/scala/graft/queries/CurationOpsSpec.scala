package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Handchecks for the curation-ops batch (q205–q208): RRF candidate-pruning
  * losslessness vs a full ranking, the kappa contingency identities, the
  * normalizer's exact-recovery invariant, and funnel monotonicity. */
class CurationOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q205: candidate-pruned RRF equals the full-ranking formulation") {
    import spark.implicits._
    val fused = run("q205_rrf_fusion").collect()
    assert(fused.length <= 100 && fused.nonEmpty)
    // recompute with unpruned global ranks (test-only window; fine at sf0.001)
    val base = graft.Tables.documents(spark, dir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id", $"n_chars".as("ka"),
        expr("CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 div size(toks)").as("kb"))
    val w = org.apache.spark.sql.expressions.Window
    val full = base
      .withColumn("rank_a", row_number().over(w.orderBy($"ka".desc, $"doc_id")).cast("long"))
      .withColumn("rank_b", row_number().over(w.orderBy($"kb".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"rank_a", $"rank_b",
        round(lit(1.0) / (lit(60) + $"rank_a") + lit(1.0) / (lit(60) + $"rank_b"), 8).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id").limit(100)
      .collect()
    assert(fused.map(_.toString).toSeq == full.map(_.toString).toSeq)
    // ranks are 1-based
    assert(fused.map(_.getAs[Long]("rank_a")).min >= 1L)
  }

  test("q206: contingency cells tile the corpus and kappa sits in [-1, 1]") {
    val r = run("q206_cohens_kappa").collect().head
    val n11 = r.getAs[Long]("n11"); val n10 = r.getAs[Long]("n10")
    val n01 = r.getAs[Long]("n01"); val n00 = r.getAs[Long]("n00")
    val total = graft.Tables.documents(spark, dir).count()
    assert(n11 + n10 + n01 + n00 == total)
    assert(Seq(n11, n10, n01, n00).forall(_ >= 0))
    val kappa = r.getAs[Double]("kappa")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q206: kappa formula handcheck on a planted 2x2 table") {
    // n=10: n11=4, n10=1, n01=2, n00=3 → a1=5, b1=6
    // po = 7/10; pe = (5*6 + 5*4)/100 = 0.5; kappa = 0.2/0.5 = 0.4
    val n = 10L; val n11 = 4L; val n00 = 3L; val a1 = 5L; val b1 = 6L
    val chance = a1 * b1 + (n - a1) * (n - b1)
    val kappa = (n * (n11 + n00) - chance).toDouble / (n * n - chance).toDouble
    assert(math.abs(kappa - 0.4) < 1e-12)
  }

  test("q207: normalization recovers every canonical document") {
    val rows = run("q207_text_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_recovered") == r.getAs[Long]("n_docs"))
      // noisy variants stay at least as distinct as their normal forms
      assert(r.getAs[Long]("distinct_noisy") >= r.getAs[Long]("distinct_norm"))
    }
  }

  test("q208: funnel stages are monotone and anchored at the raw corpus") {
    val rows = run("q208_curation_funnel").collect().sortBy(_.getAs[String]("stage"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_raw", "2_exact", "3_near_dup"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs(0) == graft.Tables.documents(spark, dir).count())
    assert(docs(0) >= docs(1) && docs(1) >= docs(2)) // each stage only drops
    assert(toks(0) >= toks(1) && toks(1) >= toks(2))
    assert(rows(0).getAs[Double]("docs_kept_pct") == 1.0)
  }
}
