package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("exact dedup: identical texts collapse to min doc_id") {
    import spark.implicits._
    val withDups = docs.limit(50)
      .unionByName(docs.limit(10).withColumn("doc_id", $"doc_id" + 10000))
    val out = Dedup.exact(withDups, "doc_id", Seq("text"))
    assert(out.count() == 50)
    assert(out.filter($"doc_id" >= 10000).count() == 0) // min-id survivors
  }

  test("minhash near-dup: planted near-duplicates collapse") {
    val before = docs.count()
    val out = Dedup.nearMinhash(docs, "doc_id", "text")
    val removed = before - out.count()
    // sf0.01 has 25 planted near-dup pairs (jaccard >= 0.15); banding with
    // >= 2 agreeing bands recovers most — each collapsed pair removes one doc
    assert(removed >= 20 && removed <= 60, s"removed $removed")
    // survivors are group minima: no removed id smaller than its group's kept id
    assert(out.count() == out.select("doc_id").distinct().count())
  }

  test("survivorsBy keeps the max-rank row per group, min-id on ties") {
    import spark.implicits._
    // two components (1-2-3 chain, 10-11) + isolated 5; quality picks the
    // survivor: 2 wins its group outright, 10 beats 11 on the id tiebreak
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (5L, 1.0),
      (10L, 4.0), (11L, 4.0)).toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Dedup.survivorsBy(rows, "id", pairs, "a", "b", $"quality")
      .select($"id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 5L, 10L))
    // same groups as min-id dedup => same surviving count on the corpus
    val byQuality = Dedup.survivorsBy(docs, "doc_id",
      Dedup.minhashPairs(docs, "doc_id", "text"), "ida", "idb", col("n_chars"))
    assert(byQuality.count() == Dedup.nearMinhash(docs, "doc_id", "text").count())
  }

  test("cosine near-dup: high-threshold dedup keeps everything; low removes") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val keepAll = Dedup.nearCosine(emb, "vec_id", "embedding", threshold = 0.99)
    assert(keepAll.count() == emb.count()) // max pair cos is ~0.51
    val removeSome = Dedup.nearCosine(emb, "vec_id", "embedding", threshold = 0.4)
    // 59 pairs above 0.4 → at least a few docs drop
    assert(removeSome.count() < emb.count())
  }

  test("a planted hot LSH bucket fails loudly instead of going quadratic") {
    import spark.implicits._
    // 300 IDENTICAL texts: every band signature collides, so one bucket
    // holds all 300 members — over a cap of 100 the guard must kill the
    // job with a diagnostic, not let the join emit ~45k pairs per band
    val degenerate = (1L to 300L).toDF("doc_id")
      .withColumn("text", lit("the same exact document body repeated verbatim"))
    val e = intercept[Exception] {
      Dedup.minhashPairs(degenerate, "doc_id", "text", maxBucket = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("LSH bucket over cap=100")), msgs(e).mkString("; "))

    // identical vectors trip the cosine guard the same way
    val vecs = (1L to 300L).toDF("vec_id")
      .withColumn("embedding", array((0 until 8).map(i => lit(0.5f + i)): _*))
    val e2 = intercept[Exception] {
      Dedup.nearCosine(vecs, "vec_id", "embedding", threshold = 0.99,
        maxBucket = 100).count()
    }
    assert(msgs(e2).exists(m => m.contains("LSH bucket over cap=100")), msgs(e2).mkString("; "))

    // under the cap the guard is invisible: same pairs as before it existed
    val ok = Dedup.minhashPairs(degenerate, "doc_id", "text", maxBucket = 1000)
    assert(ok.count() == 300L * 299L / 2)
  }

  test("cosineBandBits grows with the corpus and pins bucket occupancy") {
    assert(Dedup.cosineBandBits(2000) == 7)      // 2000/16 = 125 -> 7 bits
    assert(Dedup.cosineBandBits(20000) == 11)    // 10x corpus -> +~3 bits
    assert(Dedup.cosineBandBits(2000000000L) == 24) // clamped: sig width cap
    assert(Dedup.cosineBandBits(1) == 4)            // floor: recall regime
    // expected occupancy n / 2^bits stays ~targetBucket across 6 decades
    for (n <- Seq(1000L, 100000L, 10000000L, 100000000L)) {
      val occ = n.toDouble / (1L << Dedup.cosineBandBits(n))
      assert(occ <= 32 && occ >= 2, s"n=$n occupancy=$occ")
    }
  }

  test("near-dup group resolution is distributed: no driver-collected pair list") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // A collected pair list would surface as a LocalTableScan (driver-local
    // rows re-parallelized); the distributed paths must not contain one.
    val mh = Dedup.nearMinhash(docs.limit(200), "doc_id", "text")
    assert(!mh.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "nearMinhash plan contains driver-local data")
    val nc = Dedup.nearCosine(emb, "vec_id", "embedding", threshold = 0.4)
    assert(!nc.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "nearCosine plan contains driver-local data")
  }

  test("connected components: min-id labels over a chain and a clique") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated pair {20,21}
    val pairs = Seq((1L,2L),(2L,3L),(3L,4L),(10L,11L),(10L,12L),(11L,12L),(20L,21L))
      .toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L->1L, 2L->1L, 3L->1L, 4L->1L,
      10L->10L, 11L->10L, 12L->10L, 20L->20L, 21L->20L))
  }

  test("connected components propagate string (non-numeric) ids fully") {
    import spark.implicits._
    // A numeric-cast convergence detector turns string labels into NULLs
    // and stops after one round; this chain needs 3 propagation rounds, so
    // under-merge would leave 'd' labelled 'b' or 'c' instead of 'a'.
    val pairs = Seq(("a","b"),("b","c"),("c","d"),("x","y"))
      .toDF("u", "v")
    val comps = Dedup.connectedComponents(pairs, "u", "v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("a"->"a", "b"->"a", "c"->"a", "d"->"a",
      "x"->"x", "y"->"x"))
  }

  test("cosine near-dup handles vectors shorter than bands*bandBits (ANSI-safe)") {
    import spark.implicits._
    // 8-dim vectors with the 16x4 default (needs dims up to 64): missing
    // dims must hash as sign-0, not throw INVALID_ARRAY_INDEX under ANSI
    val df = Seq(
      (1L, Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),
      (3L, Array(-1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.nearCosine(df, "vec_id", "embedding", threshold = 0.95)
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // 2 collapses into 1; 3 is dissimilar
  }

  test("connected components match a union-find reference on random graphs") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (0 until 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: classic union-find with min-id roots
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("semantic dedup: planted duplicate vectors drop, distinct ones survive") {
    import spark.implicits._
    val vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // plant exact copies of 5 vectors under larger ids: cosine 1.0 and the
    // same nearest centroid by construction, so every copy must drop
    val planted = vecs.limit(5).withColumn("vec_id", $"vec_id" + 100000L)
    val out = Dedup.semantic(vecs.unionByName(planted),
      "vec_id", "embedding", threshold = 0.99, k = 8)
    assert(out.filter($"vec_id" >= 100000L).count() == 0, "planted copies kept")
    // threshold just under 1: only the exact copies drop, nothing else at
    // 0.99 in this corpus (max organic within-cluster cosine ~0.51)
    assert(out.count() == vecs.count())
    assert(out.columns.contains("__cluster"))
  }

  test("semantic dedup survivor rule is an anti-join: order-independent") {
    import spark.implicits._
    // chain in one cluster (k=1 removes clustering from the picture):
    // a~b and b~c near, a~c far. The anti-join rule drops BOTH b (a<b
    // near) and c (b<c near — b's own dropped fate is irrelevant, unlike
    // the sequential greedy rule, which would re-keep c)
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)),        // a
      (2L, Array(0.95f, 0.3122f)),    // b: cos(a,b) ~ 0.95
      (3L, Array(0.8049f, 0.5934f)),  // c: cos(b,c) ~ 0.95, cos(a,c) ~ 0.80
      (10L, Array(-1.0f, 0.0f))       // far from everything
    ).toDF("id", "vec")
    val out = Dedup.semantic(rows, "id", "vec", threshold = 0.9, k = 1)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 10L), s"got $out")
  }
}
