package graft.tools

import org.apache.spark.sql.SparkSession

/** Rehearsal probe for the nearCosine banding tradeoff: times the dedup
  * API on a directory's embeddings at the gate-pinned 16x4 banding vs the
  * [[graft.dedup.Dedup.cosineBandBits]]-tuned width, and reports survivor
  * counts so the recall cost of the coarser bucketing is visible next to
  * the wall-clock win. Usage: runMain graft.tools.CosineTuneProbe [dir]. */
object CosineTuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val tuned = graft.dedup.Dedup.cosineBandBits(n)
    def run(bands: Int, bits: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = graft.dedup.Dedup.nearCosine(emb, "vec_id", "embedding",
        threshold = sys.env.getOrElse("PROBE_THRESHOLD", "0.4").toDouble, bands = bands, bandBits = bits).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    run(16, 4) // warm-up pass: JIT + codegen
    val (c1, t1) = run(16, 4)
    val (c2, t2) = run(64 / tuned, tuned)
    println(f"n=$n default 16x4: $t1%.2f s, $c1 survivors; " +
      f"tuned ${64 / tuned}x$tuned: $t2%.2f s, $c2 survivors")
    spark.stop()
  }
}
