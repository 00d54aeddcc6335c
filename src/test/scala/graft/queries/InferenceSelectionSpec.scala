package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Semantic handchecks for the inference/selection gates: tiny corpora with
  * known closed-form answers, written as parquet fixtures and run through
  * the REAL `SparkEntry.queries` entries (same code path the driver gates).
  */
class InferenceSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private lazy val fixtures: String = {
    val dir = tmpDir("infsel")
    // events: click values (1,2), view values (2,3) -> KS D = 0.5, MWU by hand
    Seq(
      (1L, 1L, "click", 1.0), (2L, 2L, "click", 2.0),
      (3L, 3L, "view", 2.0), (4L, 4L, "view", 3.0),
      // a second type for autocorr: perfectly linear series
      (5L, 10L, "purchase", 1.0), (6L, 20L, "purchase", 2.0),
      (7L, 30L, "purchase", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem: y = 2x + 1 exactly, one group
    Seq(("A", 1.0, 3.0), ("A", 2.0, 5.0), ("A", 3.0, 7.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // part: skyline of (size min, price max)
    Seq((1L, "p1", 1, 10.0), (2L, "p2", 1, 5.0), (3L, "p3", 2, 12.0),
      (4L, "p4", 2, 12.0), (5L, "p5", 3, 11.0))
      .toDF("p_partkey", "p_name", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // documents: bigram LM handcheck
    Seq((1L, "a b", "en", "s", 3L), (2L, "a b a c", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q114 KS statistic on a closed-form two-sample case") {
    val r = run("q114_ks_test", fixtures).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n1") == 2 && row.getAs[Long]("n2") == 2)
    // F1 = {1:.5, 2:1, 3:1}; F2 = {1:0, 2:.5, 3:1} -> D = 0.5
    assert(row.getAs[Double]("ks_d") == 0.5)
  }

  test("q115 Mann-Whitney U with a tie, by hand") {
    val row = run("q115_mannwhitney_u", fixtures).collect()(0)
    // combined sorted: 1(c) 2(c) 2(v) 3(v); ranks: 1, 2.5, 2.5, 4
    // R1 = 1 + 2.5 = 3.5; U1 = R1 - n1(n1+1)/2 = 0.5; U2 = n1*n2 - U1 = 3.5
    assert(row.getAs[Double]("u1") == 0.5 && row.getAs[Double]("u2") == 3.5)
  }

  test("q115 U1 + U2 == n1*n2 on the gate corpus") {
    val row = run("q115_mannwhitney_u", "/root/testdata/sf0.001").collect()(0)
    val (n1, n2) = (row.getAs[Long]("n1"), row.getAs[Long]("n2"))
    assert(row.getAs[Double]("u1") + row.getAs[Double]("u2") ==
      n1.toDouble * n2.toDouble)
  }

  test("q116 OLS recovers an exact linear relation") {
    val row = run("q116_group_ols", fixtures).collect()(0)
    assert(row.getAs[Double]("slope") == 2.0)
    assert(row.getAs[Double]("intercept") == 1.0)
    assert(row.getAs[Double]("r2") == 1.0)
  }

  test("q117 autocorr of a strictly linear series is 1") {
    val r = run("q117_autocorr", fixtures).collect()
      .map(x => x.getAs[String]("g") -> x).toMap
    assert(r("purchase").getAs[Long]("n_pairs") == 2)
    assert(r("purchase").getAs[Double]("autocorr") == 1.0)
  }

  test("q118 skyline keeps ties, drops dominated sizes") {
    val got = run("q118_skyline", fixtures).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("p_size"),
        r.getAs[Double]("p_retailprice"))).toSet
    // size 1: max price 10 survives; size 2: both price-12 ties survive
    // (12 > 10); size 3: price 11 < 12 at smaller size -> dominated
    assert(got == Set((1L, 1, 10.0), (3L, 2, 12.0), (4L, 2, 12.0)))
  }

  test("q120 Spearman is 1 for a monotonic relation (ranks, not values)") {
    val row = run("q120_spearman", fixtures).collect()(0)
    // y = 2x+1 is monotonic in x, so rank corr is exactly 1 even though
    // the spec point is that VALUES need not be linear
    assert(row.getAs[Double]("spearman") == 1.0)
  }

  test("q119 selection equals the full ordering's top-k and is reproducible") {
    val dir = "/root/testdata/sf0.001"
    val a = run("q119_weighted_sample", dir).collect().map(_.getAs[Long]("doc_id"))
    val b = run("q119_weighted_sample", dir).collect().map(_.getAs[Long]("doc_id"))
    assert(a.toSeq == b.toSeq, "weighted sample must be deterministic")
    // heavier docs must be overrepresented vs a uniform draw: compare the
    // sample's mean weight to the corpus mean (priority ~ h/weight)
    val sampleMean = run("q119_weighted_sample", dir)
      .agg(org.apache.spark.sql.functions.avg($"n_chars")).collect()(0).getDouble(0)
    val corpusMean = graft.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.avg($"n_chars")).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("q121 bigram scores match the hand-computed model") {
    val got = run("q121_bigram_lm_score", fixtures).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_prob"))).toMap
    // model: P(b|a)=2/3, P(a|b)=1, P(c|a)=1/3 (fixed-point floor at 8 digits)
    assert(got(1L) == (1L, 0.666667))
    assert(got(2L) == (3L, 0.666667)) // (2/3 + 1 + 1/3)/3
  }

  test("q122 degree mass balances the q27 pair list") {
    val dir = "/root/testdata/sf0.001"
    val pairs = run("q27_minhash_lsh", dir).count()
    val dist = run("q122_pair_degree_dist", dir).collect()
    val totalDocs = graft.Tables.documents(spark, dir).count()
    assert(dist.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    val degreeMass = dist.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    assert(degreeMass == 2 * pairs, "sum of degrees must be twice the edge count")
  }
}
