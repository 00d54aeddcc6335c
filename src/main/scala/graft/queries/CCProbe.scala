package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off profiling probe for q67: how much of its runtime is the
  * candidate-pair pipeline vs the label-propagation loop, and how many
  * rounds the loop runs at the probed SF. Not part of the query surface.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session on an unrelated query
    graft.SparkEntry.queries("q16_distinct")(spark, dir).write.format("noop").mode("overwrite").save()

    val pairs = time("pairs-build+materialize") {
      TextDedupQueries.minhashBandPairs(spark, dir, minBands = 2)
        .select($"doc_a", $"doc_b").localCheckpoint()
    }
    println(s"PROBE n_pairs ${pairs.count()}")
    val cc = time("connected-components") {
      val out = graft.dedup.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      out.write.format("noop").mode("overwrite").save()
      out
    }
    println(s"PROBE n_nodes ${cc.count()}")
    spark.stop()
  }
}
