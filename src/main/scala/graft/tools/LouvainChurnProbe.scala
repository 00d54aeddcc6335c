package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement BEFORE mechanism for the proposed q305 candidate pruning
  * (round-13 verdict item 8): a Louvain round may skip node i's argmax
  * only if (a) no neighbor of i changed label AND (b) no candidate
  * community of i (its neighbors' labels + its own) changed MASS — the
  * score s = m·k_ic − k_i·(tot_c − [c=own]k_i) reads the global tot_c,
  * so mass churn alone can flip a best community even under a frozen
  * neighborhood. This probe replays the exact q305 rounds at sf0.1 and
  * reports, per round, the mover fraction and the fraction of nodes a
  * sound prune would still have to re-argmax. If that fraction is ~1,
  * the pruning buys nothing at this round count — a negative recorded
  * for ~40 lines of probe instead of a speculative rework.
  */
object LouvainChurnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // q305's co-purchase graph, rebuilt the same way (canonical x<y then
    // mirrored) — see GraphTraversalQueries.copurchaseEdges
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey")
    val und = li.groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey").as("ps"))
      .select(explode(expr("flatten(transform(ps, x -> " +
        "transform(filter(ps, y -> y > x), y -> " +
        "struct(x AS src, y AS dst))))")).as("p"))
      .select($"p.src".as("src"), $"p.dst".as("dst")).distinct()
    val edges = und.union(und.select($"dst", $"src")).localCheckpoint(true)
    val mTotal = edges.count()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("k")).localCheckpoint(true)
    val nV = deg.count()
    println(s"[probe] |E|=$mTotal |V|=$nV")

    var labels = deg.select($"src".as("id"), $"src".as("lab")).localCheckpoint(true)
    for (r <- 1 to 3) {
      val tot = labels.join(deg, $"id" === $"src").drop("src")
        .groupBy($"lab").agg(sum($"k").as("tot"))
        .select($"lab".as("t_lab"), $"tot")
      val kic = edges.join(labels.select($"id".as("dst_id"), $"lab"),
          $"dst" === $"dst_id")
        .groupBy($"src", $"lab").agg(count(lit(1)).as("kic"))
        .select($"src".as("id"), $"lab".as("c"), $"kic")
      val bestN = kic
        .join(deg.select($"src".as("id"), $"k"), Seq("id"))
        .join(labels.select($"id", $"lab".as("own")), Seq("id"))
        .join(tot, $"c" === $"t_lab")
        .select($"id", $"own", $"k",
          struct(
            (-(lit(mTotal) * $"kic" -
              $"k" * ($"tot" - when($"c" === $"own", $"k").otherwise(0L))))
              .as("ns"),
            $"c").as("cand"))
        .groupBy($"id")
        .agg(min($"cand").as("best"),
          first($"own").as("own"), first($"k").as("k"))
      val prev = labels
      labels = bestN
        .join(tot, $"own" === $"t_lab")
        .select($"id", least($"best",
          struct(($"k" * ($"tot" - $"k")).as("ns"), $"own".as("c"))).as("best"))
        .select($"id", $"best.c".as("lab"))
        .localCheckpoint(true)

      // churn accounting for the round that just happened
      val moved = labels.as("n").join(prev.as("p"), col("n.id") === col("p.id"))
        .select(col("n.id").as("id"), col("n.lab").as("nl"), col("p.lab").as("pl"))
        .filter($"nl" =!= $"pl").localCheckpoint(true)
      val nMoved = moved.count()
      // communities whose mass changed = old ∪ new labels of movers
      val churned = moved.select($"nl".as("cc"))
        .union(moved.select($"pl".as("cc"))).distinct().localCheckpoint(true)
      val nChurned = churned.count()
      // nodes a sound prune still re-argmaxes NEXT round:
      //   neighbor moved, OR own/neighbor candidate community churned
      val neighborMoved = edges
        .join(moved.select($"id".as("mid")), $"dst" === $"mid", "left_semi")
        .select($"src".as("id")).distinct()
      val candChurned = edges
        .join(labels.select($"id".as("nid"), $"lab"), $"dst" === $"nid")
        .select($"src".as("id"), $"lab")
        .union(labels)
        .join(churned, $"lab" === $"cc", "left_semi")
        .select($"id").distinct()
      val need = neighborMoved.union(candChurned).distinct().count()
      println(f"[probe] round $r: movers $nMoved (${100.0 * nMoved / nV}%.1f%%), " +
        f"mass-churned communities $nChurned, " +
        f"re-argmax needed next round $need (${100.0 * need / nV}%.1f%%)")
    }
    spark.stop()
  }
}
