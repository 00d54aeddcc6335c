package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Randomized real-exec validation of the two chained-stateful flush
  * rules the q326/q333 oracles encode (each pinned on corpus probes; here
  * re-checked on random fixtures whose watermark lands at varied offsets
  * against the window lattice):
  *  - join→agg (q326's shape): tumbling windows over an interval-join
  *    output flush at `end ≤ wm − join_interval` — the join LOWERS the
  *    propagated watermark by its event-time range;
  *  - agg→agg (q333's shape): outer windows over an inner aggregation
  *    flush at `end ≤ wm` — an aggregation propagates UNDELAYED.
  * Five random single-data-batch fixtures per shape; wm = ms-floored max
  * event time − 1h delay, per side for the join. */
class ChainedStatefulPropertySpec extends SparkTestBase {

  private val Day = 86400L * 1000000L
  private val Hour = 3600L * 1000000L

  private def stage(rows: Seq[(String, Long, Long)], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"chain_prop_$tag").toString
    rows.toDF("k", "tsu", "v").coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/data")
    s"$dir/data"
  }

  private def runStream(df: DataFrame, sink: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink)
  }

  test("agg→agg flushes at end <= wm on random fixtures") {
    import spark.implicits._
    val rnd = new scala.util.Random(333L)
    for (trial <- 1 to 5) {
      val rows = (1 to 30 + rnd.nextInt(40)).map { i =>
        (s"k${i % 3}", Day + math.abs(rnd.nextLong()) % (8L * Hour),
          (i % 7).toLong)
      }
      val path = stage(rows, s"agg$trial")
      val schema = spark.read.parquet(path).schema
      val sink = s"chain_agg_$trial"
      val out = runStream(
        spark.readStream.schema(schema)
          .parquet(path.replace("/data", "/[d]ata"))
          .select($"k", timestamp_micros($"tsu").as("ets"), $"v")
          .withWatermark("ets", "1 hour")
          .groupBy(window($"ets", "5 minutes").as("w5"))
          .agg(count(lit(1)).as("n5"))
          .groupBy(window(window_time($"w5"), "20 minutes").as("wo"))
          .agg(sum($"n5").as("n")),
        sink)
        .select(unix_micros($"wo.start"), $"n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wm = (rows.map(_._2).max / 1000L) * 1000L - Hour
      val want = rows.groupBy(r => r._2 - r._2 % (1200L * 1000000L))
        .map { case (ws, rs) => (ws, rs.size.toLong) }
        .filter { case (ws, _) => ws + 1200L * 1000000L <= wm }
        .toSet
      assert(out == want, s"agg→agg trial $trial: $out vs $want")
    }
  }

  test("join→agg flushes at end <= wm - interval on random fixtures") {
    import spark.implicits._
    val rnd = new scala.util.Random(326L)
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(40)
      val rows = (1 to n).map { i =>
        val typ = if (i % 2 == 0) "purchase" else "click"
        (typ, Day + math.abs(rnd.nextLong()) % (10L * Hour), (i % 5).toLong)
      }
      val path = stage(rows, s"join$trial")
      val schema = spark.read.parquet(path).schema
      def src = spark.readStream.schema(schema)
        .parquet(path.replace("/data", "/[d]ata"))
        .select($"k", timestamp_micros($"tsu").as("ets"), $"v")
      val p = src.filter($"k" === "purchase")
        .select($"v".as("pu"), $"ets".as("pts")).withWatermark("pts", "1 hour")
      val c = src.filter($"k" === "click")
        .select($"v".as("cu"), $"ets".as("cts")).withWatermark("cts", "1 hour")
      val sink = s"chain_join_$trial"
      val out = runStream(
        p.join(c, $"pu" === $"cu" &&
            $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES") && $"cts" <= $"pts")
          .groupBy(window($"pts", "20 minutes").as("w"))
          .agg(count(lit(1)).as("np")),
        sink)
        .select(unix_micros($"w.start"), $"np").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ps = rows.filter(_._1 == "purchase")
      val cs = rows.filter(_._1 == "click")
      val wm = math.min((ps.map(_._2).max / 1000L) * 1000L,
        (cs.map(_._2).max / 1000L) * 1000L) - Hour
      val cutoff = wm - 1800L * 1000000L // join interval lowers it
      val pairs = for {
        pr <- ps; cl <- cs
        if pr._3 == cl._3 && cl._2 >= pr._2 - 1800L * 1000000L &&
          cl._2 <= pr._2
      } yield pr._2 - pr._2 % (1200L * 1000000L)
      val want = pairs.groupBy(identity)
        .map { case (ws, o) => (ws, o.size.toLong) }
        .filter { case (ws, _) => ws + 1200L * 1000000L <= cutoff }
        .toSet
      assert(out == want, s"join→agg trial $trial: $out vs $want")
    }
  }
}
