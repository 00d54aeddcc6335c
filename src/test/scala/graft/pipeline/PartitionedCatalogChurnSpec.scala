package graft.pipeline

import java.sql.{Date, Timestamp}
import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Model-based churn for the partitioned versioning protocol (q365's
  * commit-by-rename): a seeded sequence of random partitioned upserts —
  * a third of them killed at the WORST crash window (pre-images
  * archived, nothing promoted) — is replayed against a plain-Scala
  * model of the MERGE semantics. Invariants after every step:
  *
  *   - a crashed upsert leaves the table bit-readable at its prior
  *     version (version number unmoved, live rows == model) and the
  *     retry lands as if the crash never happened;
  *   - every version inside the retention horizon replays EXACTLY
  *     (readAsOf == the model's snapshot at that version);
  *   - a version beyond retention fails loudly, never silently wrong.
  *
  * The q365 gate proves one two-version derivation against DuckDB; this
  * spec walks the protocol through a dozen commits with interleaved
  * failures — the shapes a single derivation can't reach (repeated
  * crash-retry cycles, archive pruning under churn, partitions created
  * mid-history then updated, multi-partition batches). */
class PartitionedCatalogChurnSpec extends SparkTestBase {

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(
        Schemas.bronze.map(_.copy(nullable = true))))
      .select("symbol", "date", "open", "high", "low", "close", "volume",
        "source", "ingested_at", "input_file")

  private def mkRow(symbol: String, date: String, close: Double): Row =
    Row(symbol, Date.valueOf(date), close, close + 1, close - 1, close, 100L,
      "churn", Timestamp.valueOf("2026-01-01 00:00:00"), "f.csv")

  test("12 random upserts with injected crashes: every retained version replays") {
    val wh = tmpDir("graft-pchurn")
    val catalog = new Catalog(spark, wh)
    val t = Schemas.tables.bronze
    val rng = new scala.util.Random(0xC4A5E14L)
    val symbols = Vector("AAA", "BBB", "CCC", "DDD", "EEE")
    val dates = Vector("2026-01-01", "2026-01-02")

    // the model: committed snapshots, version v at index v-1
    var state = Map.empty[(String, String), Double]
    var nCrashes = 0
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Map[(String, String), Double]]

    def readLive(): Map[(String, String), Double] =
      catalog.read(t).collect().map { r =>
        (r.getAs[String]("symbol"), r.getAs[Date]("date").toString) ->
          r.getAs[Double]("close")
      }.toMap

    (1 to 12).foreach { step =>
      val batch = (0 until 1 + rng.nextInt(3)).flatMap { _ =>
        val s = symbols(rng.nextInt(symbols.size))
        (0 until 1 + rng.nextInt(2)).map { _ =>
          (s, dates(rng.nextInt(dates.size)), (step * 100 + rng.nextInt(100)).toDouble)
        }
      }.distinct
      // dedup batch keys (incoming must have unique (symbol, date))
      val keyed = batch.groupBy(b => (b._1, b._2)).map(_._2.head).toSeq
      val rows = keyed.map { case (s, d, c) => mkRow(s, d, c) }

      val crash = snapshots.nonEmpty && rng.nextInt(3) == 0
      if (crash) {
        nCrashes += 1
        catalog.crashHook = () => throw new RuntimeException("injected crash")
        intercept[RuntimeException] {
          catalog.upsert(df(rows), t, keys = Seq("symbol", "date"),
            partitionBy = Seq("symbol"))
        }
        catalog.crashHook = () => ()
        // table must be bit-readable at the PRIOR committed state
        assert(catalog.version(t) == snapshots.size.toLong,
          s"step $step: version moved across a crash")
        assert(readLive() == state, s"step $step: live rows corrupted by crash")
      }
      // the (possibly retried) upsert lands
      catalog.upsert(df(rows), t, keys = Seq("symbol", "date"),
        partitionBy = Seq("symbol"))
      state = state ++ keyed.map { case (s, d, c) => (s, d) -> c }.toMap
      snapshots += state
      assert(catalog.version(t) == snapshots.size.toLong,
        s"step $step: version != commit count")
      assert(readLive() == state, s"step $step: live read != model")
    }

    // every version in the retention horizon replays exactly; beyond it
    // the read fails loudly (retainVersions = 3 archives -> 4 readable)
    val cur = snapshots.size.toLong
    val oldestReadable = math.max(1L, cur - 3)
    (oldestReadable to cur).foreach { v =>
      val got = catalog.readAsOf(t, v).collect().map { r =>
        (r.getAs[String]("symbol"), r.getAs[Date]("date").toString) ->
          r.getAs[Double]("close")
      }.toMap
      assert(got == snapshots((v - 1).toInt),
        s"version $v replay != model snapshot")
    }
    assertThrows[IllegalArgumentException] {
      catalog.readAsOf(t, oldestReadable - 1).collect()
    }
    // a churn run that never crashed would be a fixture, not a fuzz
    assert(nCrashes >= 2, s"seed produced only $nCrashes crash injections")
  }
}
