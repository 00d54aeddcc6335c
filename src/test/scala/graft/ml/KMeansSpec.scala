package graft.ml

import graft.{SparkTestBase, Tables}

class KMeansSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val vecs = Tables.embeddings(spark, dir)

  test("inertia is non-increasing across Lloyd iterations") {
    val objectives = (0 to 4).map { it =>
      KMeans.fit(vecs, "vec_id", "embedding", k = 8, iters = it)
        .inertia(vecs, "embedding")
    }
    objectives.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur <= prev + 1e-12, s"inertia rose: $objectives")
    }
    assert(objectives.last < objectives.head, "no improvement over init")
  }

  test("fit is deterministic and assignment is repartition-invariant") {
    val m1 = KMeans.fit(vecs, "vec_id", "embedding", k = 8, iters = 3)
    val m2 = KMeans.fit(vecs.repartition(7), "vec_id", "embedding", k = 8, iters = 3)
    // same input rows, same seeds; double sums are accumulation-order
    // dependent so compare at tolerance, not bitwise (the gate form q142
    // is the bit-exact variant)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    val assign = vecs.select(col2("vec_id"), m1.assignCol(col2("embedding")).as("c"))
    val again = vecs.repartition(5)
      .select(col2("vec_id"), m1.assignCol(col2("embedding")).as("c"))
    assert(assign.except(again).isEmpty && again.except(assign).isEmpty)
  }

  test("every vector is assigned to its genuinely nearest centroid") {
    val m = KMeans.fit(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val rows = vecs.select(col2("vec_id"), col2("embedding"),
      m.assignCol(col2("embedding")).as("c")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val dists = m.centroids.map(c =>
        c.zip(v).map { case (cv, x) => (x - cv) * (x - cv) }.sum)
      assert(dists(r.getInt(2)) <= dists.min + 1e-12)
    }
  }

  test("a cluster that loses all members keeps its centroid (no NaN, no crash)") {
    import spark.implicits._
    // two identical seed vectors: every point ties to both centroids and
    // the lower index wins, so cluster 1 is empty from round 1 onward
    val dup = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f)),
      (3L, Array(1.5f, 2.5f)), (4L, Array(0.5f, 1.5f)))
      .toDF("vec_id", "embedding")
    val m = KMeans.fit(dup, "vec_id", "embedding", k = 2, iters = 3)
    assert(m.centroids(1).sameElements(Array(1.0, 2.0)),
      "empty cluster's centroid should stay at its seed")
    assert(m.centroids.flatten.forall(v => !v.isNaN))
    val assigned = dup.select(m.assignCol(col2("embedding")).as("c"))
      .collect().map(_.getInt(0))
    assert(assigned.forall(_ == 0), "all points should land in cluster 0")
  }

  private def col2(n: String) = org.apache.spark.sql.functions.col(n)
}
