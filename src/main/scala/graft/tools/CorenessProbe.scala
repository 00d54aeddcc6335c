package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: per-round wall + changed-count for the q217 coreness
  * loop at SPARK_GRAFT_SF_DIR, to attribute the gate's wall between
  * round count, per-round stage floor, and data work. Not part of any
  * gate; run manually while tuning. MIRRORS [[graft.graph.Graph.coreness]]
  * (merge/fullStep/deltaStep and the full/delta threshold) — when the
  * production loop changes, change this in lockstep or the probe
  * attributes a shape that no longer ships. */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val s = spark
    val li = graft.Tables.lineitem(s, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
    val und = li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"b.l_linenumber" === $"a.l_linenumber" + 1 &&
          $"a.l_partkey" =!= $"b.l_partkey")
      .select(least($"a.l_partkey", $"b.l_partkey").as("src"),
        greatest($"a.l_partkey", $"b.l_partkey").as("dst"))
      .distinct()
    val edges = und.union(und.select($"dst", $"src"))

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[probe] $tag%-22s ${(t1 - t0) / 1e9}%.3f s")
      t0 = t1
    }
    val e0 = edges.select($"src", $"dst").localCheckpoint(true)
    lap("e0 checkpoint")
    var c = e0.groupBy($"src".as("id")).agg(count(lit(1)).as("c"))
      .withColumn("chg", lit(true)).localCheckpoint(true)
    lap("degrees")
    val nV = c.count()
    lap(s"count nV=$nV")
    val parts = math.min(32L, math.max(8L, nV / 16384L + 1L)).toInt
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val eIn = e0.repartition(parts, $"dst").sortWithinPartitions($"dst")
      .localCheckpoint(true)
    val eOut = e0.repartition(parts, $"src").sortWithinPartitions($"src")
      .localCheckpoint(true)
    lap("pinned copies")
    def merge(cur: org.apache.spark.sql.DataFrame, upd: org.apache.spark.sql.DataFrame) =
      cur.select($"id", $"c".as("c0")).join(upd, Seq("id"), "left")
        .select($"id", coalesce($"h", $"c0").as("c"),
          ($"h".isNotNull && $"h" =!= $"c0").as("chg"))
    def fullStep(cur: org.apache.spark.sql.DataFrame) =
      merge(cur, eIn
        .join(cur.select($"id".as("nid"), $"c".as("nc")), $"dst" === $"nid")
        .groupBy($"src".as("id"))
        .agg(org.apache.spark.sql.graft.hindex.hIndex($"nc").as("h")))
    def deltaStep(cur: org.apache.spark.sql.DataFrame) = {
      val act = cur.filter($"chg").select($"id".as("aid"))
      val touched = eIn.join(act, $"dst" === $"aid", "left_semi")
        .select($"src".as("tid"))
      merge(cur, eOut.join(touched, $"src" === $"tid", "left_semi")
        .join(cur.select($"id".as("nid"), $"c".as("nc")), $"dst" === $"nid")
        .groupBy($"src".as("id"))
        .agg(org.apache.spark.sql.graft.hindex.hIndex($"nc").as("h")))
    }
    var round = 0
    var changed = nV
    while (round < 28 && changed != 0L) {
      val kind = if (changed * 64 >= nV) "full " else "delta"
      val prev = c
      c = (if (changed * 64 >= nV) fullStep(c) else deltaStep(c)).localCheckpoint(false)
      val tC = System.nanoTime()
      changed = c.filter($"chg").count() // materializes the lazy checkpoint
      graft.graph.Graph.releaseCheckpoint(prev)
      round += 1
      val t1 = System.nanoTime()
      println(f"[probe] round $round%2d $kind chk ${(tC - t0) / 1e9}%.3f s " +
        f"cnt ${(t1 - tC) / 1e9}%.3f s changed=$changed")
      t0 = t1
    }
    spark.stop()
  }
}
