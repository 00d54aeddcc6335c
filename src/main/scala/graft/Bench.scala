package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is forced through a "noop" write, not count(): count() lets
  * Catalyst prune the final projections (a scalar-function query would
  * benchmark as a row count), while the noop sink evaluates every output
  * column and discards it.
  *
  * Every query runs TWICE: an untimed warm-up execution immediately
  * followed by the timed one. The first execution of a query pays one-off
  * JVM costs — janino codegen compilation, JIT of the generated classes,
  * parquet footer caches — that a long-lived engine pays once per query
  * shape, not per run; timing run two measures the engine, not the JIT
  * (measured ~2x inflation on decimal-heavy plans otherwise). Nothing is
  * cached between the two executions Spark-side: each call rebuilds the
  * DataFrame, so scans, shuffles, and any in-query localCheckpoint
  * materializations are fully re-executed and still inside the timing.
  * The cold pass total is reported alongside as "cold_total_sec".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var coldTotal = 0.0
    val results = names.flatMap { name =>
      // warm-up execution: pays codegen/JIT/footer-cache one-offs
      val c0 = System.nanoTime()
      try force(name) catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      coldTotal += (System.nanoTime() - c0) / 1e9
      // GC BETWEEN executions (outside the timed section): the
      // ContextCleaner only reclaims finished queries' broadcasts/shuffles
      // after a GC, and without one later queries measure the whole run's
      // memory pressure.
      System.gc()
      val t0 = System.nanoTime()
      try force(name) catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      // a crashed query has no meaningful duration: failure is reported in
      // "errors" (and the exit code), never encoded into the timing map
      if (errors.contains(name)) None else Some(name -> dt)
    }
    // The result line must stay SHORT: the harness that captures this
    // output keeps only the last ~2000 characters, and a 113-entry map with
    // full query names and 17-significant-digit doubles overflows that
    // window, truncating the line's head and making it unparseable. Short
    // keys ("q01" for "q01_pricing_summary") and millisecond precision keep
    // the whole line comfortably inside the window.
    // 2 dp per query: bench noise is ±20%, and at 140+ queries every byte
    // of the line counts against the 2000-char capture window. If the map
    // still outgrows the window (more queries added), degrade to 1 dp
    // rather than risk the head of the line being truncated off.
    def qsAt(dp: Int) = results.map { case (k, v) =>
      val short = k.takeWhile(_ != '_')
      "\"" + short + "\":" + BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
    val qs2 = qsAt(2)
    val qs = if (qs2.length <= 1650) qs2 else qsAt(1)
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors
        .map { case (k, v) => s"${JsonEscape(k)}:${JsonEscape(v)}" }
        .mkString("{", ",", "}")
    def sec(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val total = sec(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir","cold_total_sec":${sec(coldTotal)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
