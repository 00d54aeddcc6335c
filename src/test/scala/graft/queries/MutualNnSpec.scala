package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Semantics handcheck for q215 (reciprocal nearest neighbors): the
  * mutual filter must drop hub-attracted one-way matches. */
class MutualNnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("mutualnn")
    // cos(A,B) ~ .995 (mutual top-1s); C's top-1 is A, but A's is B →
    // C must NOT pair. D is far from everything and points at C;
    // C does not reciprocate.
    Seq(
      (1L, Array(1.0f, 0.0f), 0),    // A
      (2L, Array(1.0f, 0.1f), 0),    // B
      (3L, Array(1.0f, -0.5f), 0),   // C
      (4L, Array(0.1f, -1.0f), 0))   // D: top-1 C; C's top-1 is A
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q215: only the genuinely reciprocal pair survives") {
    val got = SparkEntry.queries("q215_mutual_nn")(spark, fixtures)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
      .toSeq
    assert(got == Seq((1L, 2L)), s"expected only the (A,B) pair, got $got")
  }

  test("q215: pairs come out canonically ordered (vec_a < vec_b), no dupes") {
    val rows = SparkEntry.queries("q215_mutual_nn")(spark, "/root/testdata/sf0.001")
      .collect()
    val pairs = rows.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }
}
