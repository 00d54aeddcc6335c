package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinearProbeSpec extends SparkTestBase {

  // linearly separable in f1: positives at f1 ~ +1, negatives at f1 ~ -1,
  // f2 pure noise-ish structure (deterministic, symmetric across classes)
  private lazy val planted = {
    import spark.implicits._
    (0 until 200).map { i =>
      val pos = i % 2 == 0
      val f1 = if (pos) 1.0 + (i % 7) * 0.01 else -1.0 - (i % 7) * 0.01
      val f2 = (i % 5) * 0.1
      (Array(f1, f2), if (pos) 1.0 else 0.0)
    }.toDF("f", "label")
  }

  test("GD learns a separating direction on planted data") {
    import spark.implicits._
    val m = LinearProbe.fitGD(planted, "f", "label", dims = 2, lr = 1.0, iters = 10)
    assert(m.weights(0) > 0.1, s"f1 weight should be positive, got ${m.weights(0)}")
    val acc = planted
      .select((when(m.scoreCol($"f") >= 0.5, 1.0).otherwise(0.0) === $"label")
        .cast("int").as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    assert(acc == 1.0, s"separable data should classify perfectly, got $acc")
  }

  test("more iterations do not increase squared error (descent sanity)") {
    import spark.implicits._
    def mse(iters: Int): Double = {
      val m = LinearProbe.fitGD(planted, "f", "label", 2, 1.0, iters)
      planted.select(pow(m.scoreCol($"f") - $"label", 2).as("e"))
        .agg(avg($"e")).head().getDouble(0)
    }
    val (e1, e5, e10) = (mse(1), mse(5), mse(10))
    assert(e5 <= e1 + 1e-12 && e10 <= e5 + 1e-12, s"mse not decreasing: $e1 $e5 $e10")
  }

  test("fitted weights are bit-identical under repartitioning") {
    val a = LinearProbe.fitGD(planted, "f", "label", 2, 0.5, 3)
    val b = LinearProbe.fitGD(planted.repartition(13), "f", "label", 2, 0.5, 3)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias,
      "9dp-rounded decimal gradient sums must make GD partitioning-invariant")
  }

  test("q201 rank-sum AUC equals brute-force pair counting (gate corpus)") {
    import spark.implicits._
    val auc = graft.SparkEntry.queries("q201_model_auc")(
      spark, "/root/testdata/sf0.001").collect()(0).getAs[Double]("auc")
    // independent O(n^2) reference on the same trained scores
    val feat = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .select(
        array(($"n_chars" / 100.0), (size($"toks") / 10.0),
          (size(array_distinct($"toks")).cast("double") / size($"toks"))).as("f"),
        when($"lang" === "en", 1.0).otherwise(0.0).as("label"))
    val m = LinearProbe.fitGD(feat, "f", "label", 3, 0.5, 3)
    val sl = feat.select(m.scoreCol($"f").as("s"), $"label").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = sl.filter(_._2 == 1.0).map(_._1)
    val neg = sl.filter(_._2 == 0.0).map(_._1)
    var conc2 = 0L // concordant pairs doubled (ties count once)
    for (p <- pos; n <- neg)
      conc2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = BigDecimal(conc2.toDouble / (2.0 * pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(auc == expected, s"rank-sum $auc vs pairwise $expected")
  }

  test("q221 calibration buckets: conserved counts, bounded means") {
    val rows = graft.SparkEntry.queries("q221_calibration")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == 500L, s"bucket counts must partition the corpus: $total")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val mp = r.getAs[Double]("mean_pred")
      val pr = r.getAs[Double]("pos_rate")
      assert(bin >= 0 && bin <= 9)
      // a bucket's mean prediction lies inside the bucket's score range
      // (9 is the clamp bucket: scores in [0.9, 1.0))
      assert(mp >= bin / 10.0 - 1e-6 && mp < (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean_pred $mp outside bucket")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - BigDecimal(mp - pr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
