package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Variant bake-off for the iterated graph gates: times edge-construction
  * shapes and round-loop strategies (fusion depth × join hint × AQE) so
  * constant-factor work is chosen by measurement, not guesswork.
  */
object GraphRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(label: String)(f: => Unit): Unit = {
      val c0 = System.nanoTime()
      f
      println(f"[probe] $label%-34s ${(System.nanoTime() - c0) / 1e9}%8.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    def pairJoin = li.as("a").join(li.as("b"),
      $"a.l_orderkey" === $"b.l_orderkey" &&
        $"b.l_linenumber" === $"a.l_linenumber" + 1 &&
        $"a.l_partkey" =!= $"b.l_partkey")

    // edge-build variants
    def edgesTwoAgg = {
      val adj = pairJoin
        .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
        .agg(min($"a.l_quantity".cast("long") + $"b.l_quantity".cast("long"))
          .as("w"))
      adj.select($"u".as("src"), $"v".as("dst"), $"w")
        .union(adj.select($"v".as("src"), $"u".as("dst"), $"w"))
        .groupBy($"src", $"dst").agg(min($"w").as("w"))
    }
    def edgesOneAgg = pairJoin
      .select(explode(array(
        struct($"a.l_partkey".as("src"), $"b.l_partkey".as("dst"),
          ($"a.l_quantity".cast("long") + $"b.l_quantity".cast("long")).as("w")),
        struct($"b.l_partkey".as("src"), $"a.l_partkey".as("dst"),
          ($"a.l_quantity".cast("long") + $"b.l_quantity".cast("long")).as("w"))))
        .as("x"))
      .groupBy($"x.src".as("src"), $"x.dst".as("dst"))
      .agg(min($"x.w").as("w"))

    // round-loop variants over a fixed checkpointed edge list
    def relaxE(e: DataFrame, hintBcast: Boolean)(cur: DataFrame): DataFrame = {
      val c = if (hintBcast) broadcast(cur) else cur
      c.as("c").join(e.as("g"), col("c.id") === col("g.src"), "left")
        .select(explode(array(
          struct(col("c.id").as("id"), col("c.dist").as("dist")),
          struct(col("g.dst").as("id"),
            (col("c.dist") + col("g.w")).as("dist")))).as("x"))
        .select($"x.id".as("id"), $"x.dist".as("dist"))
        .filter($"id".isNotNull)
        .groupBy($"id").agg(min($"dist").as("dist"))
    }
    def relaxU(e: DataFrame)(cur: DataFrame): DataFrame =
      cur.select($"id", $"dist")
        .union(cur.as("c").join(e.as("g"), col("c.id") === col("g.src"))
          .select(col("g.dst").as("id"),
            (col("c.dist") + col("g.w")).as("dist")))
        .groupBy($"id").agg(min($"dist").as("dist"))

    def loop(e: DataFrame, batch: Int, relax: DataFrame => DataFrame): DataFrame = {
      var dist = e.select($"src".as("id")).filter($"id" % 97 === 0)
        .distinct().select($"id", lit(0L).as("dist")).localCheckpoint(true)
      var r = 0
      while (r < 6) {
        val steps = math.min(batch, 6 - r)
        var next = dist
        for (_ <- 1 to steps) next = relax(next)
        r += steps
        dist = if (r < 6) next.localCheckpoint(true) else next
      }
      dist
    }

    // self-loop augmentation: a zero-weight self-loop per node turns the
    // carry-over into a relaxation, so the join is INNER (AQE can
    // auto-broadcast the small frontier) and no explode is needed
    def withSelfLoops(e: DataFrame): DataFrame =
      e.union(
        e.select($"src".as("id")).union(e.select($"dst".as("id"))).distinct()
          .select($"id".as("src"), $"id".as("dst"), lit(0L).as("w")))
    def relaxSelf(e: DataFrame)(cur: DataFrame): DataFrame =
      cur.as("c").join(e.as("g"), col("c.id") === col("g.src"))
        .select(col("g.dst").as("id"), (col("c.dist") + col("g.w")).as("dist"))
        .groupBy($"id").agg(min($"dist").as("dist"))

    // PPR round variants
    def pprEdges(e: DataFrame) = e
      .join(e.groupBy($"src").agg(count(lit(1)).as("od")), "src")
      .select($"src", $"dst", $"od")
    def pprLoop(ed: DataFrame, nodes: DataFrame, batch: Int): DataFrame = {
      var rank = nodes.select($"id", ($"sd".cast("long") * 1000000000L).as("r"))
      var it = 0
      while (it < 5) {
        val steps = math.min(batch, 5 - it)
        for (_ <- 1 to steps) {
          val contrib = ed.join(rank, ed("src") === rank("id"))
            .select($"dst", expr("r div od").as("c"))
            .groupBy($"dst").agg(sum($"c").as("c"))
          rank = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
            .select($"id", $"sd",
              expr(s"sd * 150000000 + (85 * coalesce(c, 0)) div 100").as("r"))
        }
        it += steps
        if (it < 5) rank = rank.localCheckpoint(true)
      }
      rank.select($"id", $"r")
    }

    // window-based edge build: linenumber+1 pairing via lag() over
    // (orderkey, linenumber) — one exchange, no self-join; identical
    // pairs because the diff==1 guard reproduces the equi-join condition
    def edgesWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
      li.select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          lag($"l_linenumber", 1).over(w).as("pn"),
          lag($"l_partkey", 1).over(w).as("pp"),
          lag($"l_quantity", 1).over(w).as("pq"))
        .filter($"pn" === $"l_linenumber" - 1 && $"pp" =!= $"l_partkey")
        .select(explode(array(
          struct($"pp".as("src"), $"l_partkey".as("dst"),
            ($"pq".cast("long") + $"l_quantity".cast("long")).as("w")),
          struct($"l_partkey".as("src"), $"pp".as("dst"),
            ($"pq".cast("long") + $"l_quantity".cast("long")).as("w")))).as("x"))
        .groupBy($"x.src".as("src"), $"x.dst".as("dst"))
        .agg(min($"x.w").as("w"))
    }

    def withParts(n: Int)(f: => Unit): Unit = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }

    for (pass <- Seq("cold", "warm")) {
      println(s"== pass: $pass ==")
      t("edges one-agg explode")(noop(edgesOneAgg))
      t("edges window lag")(noop(edgesWindow))
      val e = edgesOneAgg.localCheckpoint(true)
      val eSelf = withSelfLoops(e).localCheckpoint(true)
      t("rounds batch2 selfloop")(noop(loop(eSelf, 2, relaxSelf(eSelf))))
      t("rounds batch2 selfloop p8")(withParts(8)(
        noop(loop(eSelf, 2, relaxSelf(eSelf)))))
      t("rounds batch3 selfloop p8")(withParts(8)(
        noop(loop(eSelf, 3, relaxSelf(eSelf)))))
      t("rounds batch6 selfloop p8")(withParts(8)(
        noop(loop(eSelf, 6, relaxSelf(eSelf)))))
      t("end2end window+batch3 p8")(withParts(8) {
        val ee = withSelfLoops(edgesWindow).localCheckpoint(true)
        noop(loop(ee, 3, relaxSelf(ee)))
        ee.unpersist(true)
      })
      val ed = pprEdges(e).localCheckpoint(true)
      val nodes = ed.select($"src".as("id")).distinct()
        .union(ed.select($"dst".as("id"))).distinct()
        .select($"id", ($"id" % 101 === 0 && $"id" < 1000000L)
          .cast("int").as("sd"))
        .localCheckpoint(true)
      t("ppr batch1 (old)")(noop(pprLoop(ed, nodes, 1)))
      t("ppr batch1 p8")(withParts(8)(noop(pprLoop(ed, nodes, 1))))
      t("ppr batch2 p8")(withParts(8)(noop(pprLoop(ed, nodes, 2))))
      Seq(e, eSelf, ed, nodes).foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
