package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Closed-form handchecks for the corpus-balance gates, through the real
  * `SparkEntry.queries` entries on parquet fixtures. */
class CorpusBalanceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("balance")
    // srcA masses 70/20/10: nucleus at p=0.9 keeps the first two
    // (cum_before 0 and 70 < 90), drops the third (cum_before 90).
    // srcB single doc: always kept. Tokens chosen for a hand TVD.
    Seq(
      (1L, "a a b", "en", "src0", 70L),
      (2L, "x", "en", "src0", 20L),
      (3L, "y", "en", "src0", 10L),
      (4L, "a b b b", "en", "src1", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // label 0 centroid (1,0) from two identical vectors; label 1 is (0,1)
    // -> orthogonal; label 2 is (3,4)-ish direction for a non-trivial cos
    Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(3.0f, 4.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q123 keeps exactly the 90%-mass prefix per source") {
    val got = SparkEntry.queries("q123_top_p_mass")(spark, fixtures).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("mass_kept"),
          r.getAs[Long]("mass_total"))).toMap
    assert(got("src0") == (2L, 90L, 100L))
    assert(got("src1") == (1L, 40L, 40L))
  }

  test("q124 TVD matches the hand-computed distributions") {
    val row = SparkEntry.queries("q124_token_tvd")(spark, fixtures).collect()(0)
    // src0: a=2/3 b=1/3 (n=3; 'x','y' live in dropped... no — q124 uses ALL
    // docs of the source); src0 tokens: a,a,b,x,y (n=5): a=.4 b=.2 x=.2 y=.2
    // src1: a=.25 b=.75. TVD = .5*(|.4-.25|+|.2-.75|+.2+.2) = 0.55
    assert(row.getAs[Long]("n1") == 5 && row.getAs[Long]("n2") == 4)
    assert(row.getAs[Long]("n_vocab") == 4)
    assert(row.getAs[Double]("tvd") == 0.55)
  }

  test("q225 Simpson diversity: uniform-ish vs concentrated, by hand") {
    val got = SparkEntry.queries("q225_simpson_diversity")(spark, fixtures)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Double]("simpson_diversity"), r.getAs[Double]("effective_vocab")))
      .toMap
    // src0: a,a,b,x,y -> sum c^2 = 7 over n=5: 1-7/25, 25/7
    assert(got("src0") == (5L, 4L, 0.72, 3.57142857))
    // src1: a,b,b,b -> sum c^2 = 10 over n=4
    assert(got("src1") == (4L, 2L, 0.375, 1.6))
  }

  test("q226 W1 length drift equals the optimal-transport cost by hand") {
    val r = SparkEntry.queries("q226_wasserstein_drift")(spark, fixtures)
      .collect().head
    // src0 lengths {1,1,3}, src1 {4}: transport cost (3+3+1)/3 = 7/3
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Double]("w1_tokens") == 2.33333333)
  }

  test("q125 centroid cosine: orthogonal, parallel, and 3-4-5 cases") {
    val got = SparkEntry.queries("q125_centroid_cosine")(spark, fixtures).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(got((0, 1)) == 0.0)      // (1,0) vs (0,1)
    assert(got((0, 2)) == 0.6)      // (1,0) vs (3,4)/5
    assert(got((1, 2)) == 0.8)      // (0,1) vs (3,4)/5
  }
}
