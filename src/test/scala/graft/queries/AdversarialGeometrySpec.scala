package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Adversarial-geometry audit for the similarity stack (VERDICT r7
  * item 3): the recall/banding gates (q70 IVF recall, q244 LSH
  * precision/recall, nearCosine + cosineBandBits) are oracle-gated on the
  * driver's synthetic tables, whose geometry is benign — near-uniform
  * vectors, even cluster sizes, no hubness. Real embedding manifolds are
  * hostile: skewed cluster masses, anisotropic spread (variance
  * concentrated in a few dims), hub points similar to everything, and
  * near-threshold similarity mass. A learned encoder is out of scope
  * (public-knowledge constraint), but the GEOMETRY is reproducible —
  * this spec generates it deterministically (fixed-seed LCG + Box-Muller,
  * driver-side, no Math.random) and re-measures the SAME gate queries on
  * it, asserting recall floors so a banding/nprobe regression on hostile
  * geometry fails a test, not a production dedup run.
  *
  * Fixture A (vectors, n=1200, d=64): six clusters with mass skew
  * 600/300/150/90/40/20, per-cluster anisotropy (4 high-variance dims,
  * 60 near-frozen), radii spanning 0.02 (near-duplicate-tight) to 1.0
  * (diffuse), plus 30 hub points near the mass-weighted global mean —
  * close to everything, the classic hubness stressor.
  *
  * Fixture B (documents): 8 templates of 30 tokens; same-template docs
  * differ by j in-place substitutions, placing shingle-Jaccard at
  * 0.65/0.51/0.40/0.30 — mass straddling the q244 truth threshold (0.5)
  * where banding errors live; a 40-copy hot template (mega near-dup
  * cluster = hot minhash buckets); Zipf-skewed background vocabulary so
  * some shingles are corpus-hot.
  */
class AdversarialGeometrySpec extends SparkTestBase {

  // ---- deterministic generator ------------------------------------------
  private final class Lcg(seed: Long) {
    private var s = seed
    def nextU(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble) / (1L << 53).toDouble
    }
    def nextG(): Double =
      math.sqrt(-2.0 * math.log(1.0 - nextU())) * math.cos(2.0 * math.Pi * nextU())
    def nextInt(n: Int): Int = (nextU() * n).toInt min (n - 1)
  }

  private val D = 64

  /** (vec_id, embedding, label) rows with hostile geometry. */
  private lazy val vectorFixtureDir: String = {
    val rng = new Lcg(0x5eedbeefL)
    val sizes = Seq(600, 300, 150, 90, 40, 20)
    // cluster centers: random unit-ish directions
    val centers = sizes.indices.map { _ =>
      val c = Array.fill(D)(rng.nextG())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    // per-cluster anisotropy: 4 active dims with radius sigmaHi, rest 0.01
    val sigmaHi = Seq(0.02, 0.10, 0.30, 0.60, 1.00, 0.45)
    val activeDims = sizes.indices.map(k => Seq.tabulate(4)(i => (k * 7 + i * 11) % D))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Int)]
    var id = 0L
    for (k <- sizes.indices; _ <- 0 until sizes(k)) {
      val v = Array.tabulate(D) { d =>
        val s = if (activeDims(k).contains(d)) sigmaHi(k) else 0.01
        (centers(k)(d) + s * rng.nextG()).toFloat
      }
      rows += ((id, v, k)); id += 1
    }
    // hub points: near the mass-weighted global mean, moderate spread
    val mean = Array.tabulate(D)(d =>
      sizes.indices.map(k => centers(k)(d) * sizes(k)).sum / sizes.sum)
    for (_ <- 0 until 30) {
      val v = Array.tabulate(D)(d => (mean(d) + 0.05 * rng.nextG()).toFloat)
      rows += ((id, v, 99)); id += 1
    }
    val dir = tmpDir("adv_vec")
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Hostile document corpus for the LSH banding audit. */
  private lazy val documentFixtureDir: String = {
    val rng = new Lcg(0xadbeef17L)
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    def add(toks: Seq[String]): Unit = { docs += ((id, toks.mkString(" "))); id += 1 }
    // 8 templates of 30 tokens; per template: the base doc + variants at
    // j substitutions (substitution positions spread so each kills 3
    // shingles: J = (28-3j)/(28+3j) = 0.65 / 0.51 / 0.40 / 0.30)
    for (t <- 0 until 8) {
      val base = Seq.tabulate(30)(i => s"t${t}w$i")
      add(base)
      for (j <- 1 to 4; r <- 0 until 3) {
        val posns = Seq.tabulate(j)(m => 3 + m * 6)
        add(base.zipWithIndex.map { case (w, i) =>
          if (posns.contains(i)) s"x${t}r${r}j$j$i" else w })
      }
    }
    // hot template: 40 near-copies (1 substitution each) — a mega
    // near-dup cluster whose shingles are corpus-hot minhash buckets
    val hot = Seq.tabulate(30)(i => s"hotw$i")
    add(hot)
    for (r <- 0 until 40) {
      val p = 2 + rng.nextInt(26)
      add(hot.zipWithIndex.map { case (w, i) => if (i == p) s"hsub$r" else w })
    }
    // Zipf-skewed background: 120 docs over a 200-word vocab, freq ~ u²
    for (_ <- 0 until 120) {
      add(Seq.fill(25)(s"bg${(math.pow(rng.nextU(), 2.0) * 200).toInt}"))
    }
    val dir = tmpDir("adv_doc")
    val spark0 = spark
    import spark0.implicits._
    docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("adv").as("source"), length(col("text")).cast("long").as("n_chars"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q70 IVF recall holds a floor on hostile vector geometry") {
    val perCell = SparkEntry.queries("q70_ivf_recall")(spark, vectorFixtureDir)
      .collect()
    val nQ = perCell.map(_.getAs[Long]("n_queries")).sum
    val overall = perCell.map(r =>
      r.getAs[Double]("recall_at_5") * r.getAs[Long]("n_queries")).sum / nQ
    info(f"hostile IVF overall recall@5 = $overall%.4f over $nQ queries, " +
      s"${perCell.length} cells")
    assert(nQ >= 1000, s"fixture queries went missing: $nQ")
    assert(overall >= 0.90,
      f"IVF recall collapsed on hostile geometry: $overall%.4f — retune " +
        "nprobe/cell seeding before trusting the index on clustered corpora")
  }

  test("clusters ≫ cells: wider nprobe recovers IVF recall (the documented knob)") {
    // 48 tight anisotropic clusters forced into a 16-cell index — several
    // clusters share a cell and near neighbors straddle cell boundaries,
    // the regime where a fixed nprobe=2 genuinely loses recall. The
    // engine's answer is the probe-width knob (ivfRecallAt), not silent
    // degradation: this measures recall at nprobe 2 vs 4 on the same
    // fixture and pins that widening recovers it.
    val rng = new Lcg(0x48c15713L)
    val dir = tmpDir("adv_many")
    val spark0 = spark
    import spark0.implicits._
    val centers = Seq.fill(48) {
      val c = Array.fill(D)(rng.nextG())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    val rows = for {
      (c, k) <- centers.zipWithIndex
      i <- 0 until (8 + (k % 5) * 8) // 8..40 per cluster, skewed
    } yield ((k * 1000 + i).toLong,
      // wide spread (σ=0.25 on a unit center): members straddle sign-bit
      // cell boundaries, so a query's true neighbors live in cells the
      // narrow probe never visits — the regime that punishes nprobe=2
      Array.tabulate(D)(d => (c(d) + 0.25 * rng.nextG()).toFloat), k)
    rows.toDF("vec_id", "embedding", "label").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def overall(nprobe: Int): Double = {
      val perCell = VectorQueries.ivfRecallAt(spark, dir, nprobe).collect()
      val nQ = perCell.map(_.getAs[Long]("n_queries")).sum
      perCell.map(r => r.getAs[Double]("recall_at_5") * r.getAs[Long]("n_queries")).sum / nQ
    }
    val curve = Seq(2, 4, 8, 16).map(p => p -> overall(p))
    info("48-cluster/16-cell recall@5 curve: " +
      curve.map { case (p, r) => f"nprobe=$p -> $r%.4f" }.mkString(", "))
    // the honest finding: when cluster spread reaches cell scale the
    // 16-cell/nprobe=2 index genuinely loses recall (measured ~0.36 here)
    // — sign-bit cells stop being informative. The contract this pins is
    // the RECOVERY KNOB, not a flattering fixture: recall is monotone in
    // nprobe and exact when every cell is probed, so a deployment meets
    // any recall target by widening probes (cost grows probe-linearly) or
    // re-clustering (the per-cell q70 rows localize which cells to split).
    for (Seq((pa, ra), (pb, rb)) <- curve.sliding(2))
      assert(rb >= ra - 1e-9, f"recall must be monotone in nprobe: $pa->$ra%.4f, $pb->$rb%.4f")
    assert(curve.last._2 >= 0.999,
      f"probing every cell is the exact ranking; got ${curve.last._2}%.4f")
    assert(curve(1)._2 >= curve.head._2 + 0.1,
      "nprobe=4 should recover substantial recall over nprobe=2 on this fixture")
  }

  test("q244 LSH banding holds precision/recall floors on the hostile corpus") {
    val row = SparkEntry.queries("q244_lsh_quality")(spark, documentFixtureDir)
      .collect().head
    val (p, r, f1) = (row.getAs[Double]("precision"),
      row.getAs[Double]("recall"), row.getAs[Double]("f1"))
    info(f"hostile LSH precision=$p%.4f recall=$r%.4f f1=$f1%.4f " +
      s"(truth=${row.getAs[Long]("n_truth")} cand=${row.getAs[Long]("n_cand")})")
    assert(row.getAs[Long]("n_truth") >= 500,
      "fixture must plant substantial truth mass (hot cluster + templates)")
    assert(r >= 0.95,
      f"banding recall dropped to $r%.4f on near-threshold + hot-bucket mass")
    assert(p >= 0.60,
      f"banding precision dropped to $p%.4f — candidate stream is mostly noise")
  }

  test("nearCosine with adaptive cosineBandBits keeps pair recall on hostile vectors") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$vectorFixtureDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .localCheckpoint()
    val n = vecs.count()
    val bb = graft.dedup.Dedup.cosineBandBits(n)
    // exact ground truth at the dedup threshold (0.85): brute-force on the
    // 1230-vector fixture — test-only, the thing the banded path replaces
    val withNorm = vecs.withColumn("nrm",
      sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)))
    val truth = withNorm.as("a").join(withNorm.as("b"),
        $"a.vec_id" < $"b.vec_id")
      .withColumn("cos",
        aggregate(zip_with($"a.v", $"b.v", (x, y) => x * y), lit(0.0), (a, x) => a + x)
          / ($"a.nrm" * $"b.nrm"))
      .filter($"cos" >= 0.85)
      .select($"a.vec_id".as("ida"), $"b.vec_id".as("idb"))
      .localCheckpoint()
    val nTruth = truth.count()
    assert(nTruth >= 1000,
      s"fixture must plant dense near-dup mass (tight clusters): $nTruth")
    // banding recall: a truth pair is a candidate iff the two vectors
    // agree on at least one full sign-bit band at the ADAPTIVE width —
    // exactly nearCosine's candidate rule with bandBits = cosineBandBits(n)
    val bands = 64 / bb
    val sigd = vecs.select($"vec_id",
      array((0 until bands).map(b =>
        graft.functions.vector.signBits($"v", b * bb, bb)): _*).as("sig"))
    val hit = truth
      .join(sigd.select($"vec_id".as("ida"), $"sig".as("sa")), "ida")
      .join(sigd.select($"vec_id".as("idb"), $"sig".as("sb")), "idb")
      .filter(exists(zip_with($"sa", $"sb", (x, y) => x === y), v => v))
      .count()
    val recall = hit.toDouble / nTruth
    info(f"hostile banding recall=$recall%.4f ($hit/$nTruth pairs, " +
      s"bandBits=$bb, bands=$bands)")
    assert(recall >= 0.98,
      f"adaptive banding lost near-dup pairs on anisotropic clusters: $recall%.4f")
  }
}
