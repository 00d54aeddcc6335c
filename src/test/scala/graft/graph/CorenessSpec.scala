package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Handchecks for Graph.coreness and the HIndexLong aggregate: known core
  * decompositions, partition-invariance of the histogram buffer, and the
  * loud non-convergence bound. */
class CorenessSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("coreness: triangle with a dangling path — tail peels to 1-core") {
    // triangle {1,2,3} with tail 3-4-5: every tail node has degree >= 1
    // only after 5 peels, so the cascade needs multiple rounds. (A path
    // CONNECTING two triangles would stay 2-core — internal degree 2.)
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Graph.coreness(edges, maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("coreness: k4 with a pendant — clique 3, pendant 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = sym(k4 :+ (4L -> 9L): _*)
    val got = Graph.coreness(edges, maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 9L -> 1L))
  }

  test("HIndexLong: known h-indexes, order- and partition-invariant") {
    val vals = Seq(3L, 0L, 6L, 1L, 5L)                  // h = 3
    for (parts <- Seq(1, 3, 5)) {
      val h = vals.map(v => ("g", v)).toDF("g", "v").repartition(parts)
        .groupBy($"g").agg(graft.functions.hindex.hIndex($"v").as("h"))
        .collect().head.getLong(1)
      assert(h == 3L, s"parts=$parts")
    }
    // all equal values: h = min(count, value)
    val h2 = Seq(4L, 4L, 4L).map(v => ("g", v)).toDF("g", "v")
      .groupBy($"g").agg(graft.functions.hindex.hIndex($"v").as("h"))
      .collect().head.getLong(1)
    assert(h2 == 3L)
  }

  test("coreness equals brute-force peeling on random graphs (property)") {
    // reference: coreness(v) = max k such that v survives the k-core
    // peel — computed by the textbook repeated-removal loop
    def peelCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var core = Map.empty[Long, Long]
      var k = 1L
      var alive = nodes.toSet
      var es = edges
      while (alive.nonEmpty) {
        // peel everything below degree k to fixpoint
        var changed = true
        while (changed) {
          val deg = es.groupBy(_._1).map { case (n, g) => n -> g.size }
          val drop = alive.filter(n => deg.getOrElse(n, 0) < k)
          changed = drop.nonEmpty
          if (changed) {
            // a dropped node's coreness is the last k it survived
            drop.foreach(n => core += n -> (k - 1))
            alive --= drop
            es = es.filter(e => alive(e._1) && alive(e._2))
          }
        }
        k += 1
      }
      core
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(8)
      val pairs = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextInt(100) < 30
      } yield (a, b)).toSeq
      if (pairs.nonEmpty) {
        val expected = peelCoreness(pairs ++ pairs.map(_.swap))
        val got = Graph.coreness(sym(pairs: _*), maxRounds = 40)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial: $got vs $expected\n$pairs")
      }
    }
  }

  test("coreness of an empty edge list is the empty frame, not an NPE") {
    val got = Graph.coreness(sym().limit(0), maxRounds = 4).collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("coreness raises loudly when the round bound is too small") {
    // a 12-node path needs several rounds; 1 round cannot converge
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      Graph.coreness(sym(path: _*), maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("the pinned layout holds: shuffle volume is two edge passes, never per-round") {
    // a K40 clique (dense: |E| >> |V|) with a 40-node path hanging off
    // (the path's 1-core peels inward ~one step per round, forcing ~20
    // rounds). The round-13 contract is that the |E|-sized adjacency is
    // exchanged exactly TWICE (the two pinned orientations) no matter
    // how many rounds run — full rounds exchange the state table into
    // the pinned layout and partial-combined histogram buffers back,
    // both |V|-sized. A regression that re-exchanges edges per round
    // (dropping the pin, the sort, or the map-side partial aggregate)
    // adds >= |E| records per round and blows the budget.
    val clique = for (a <- 1L to 40L; b <- (a + 1) to 40L) yield (a, b)
    val path = (40L until 80L).map(i => (i, i + 1))
    val edges = sym((clique ++ path): _*)
    val dirE = 2L * (clique.size + path.size) // 1640 directed edges
    val nV = 81L
    val maxRounds = 40
    val sc = spark.sparkContext
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { recs.addAndGet(m.shuffleWriteMetrics.recordsWritten); () }
      }
    }
    sc.addSparkListener(listener)
    try {
      val got = Graph.coreness(edges, maxRounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == 39L && got(80L) == 1L, "sanity: clique 39-core, path tail 1-core")
      org.apache.spark.graft.BusDrain.drain(sc)
      // budget: the two pins + a generous per-round state allowance
      // (estimate exchange + agg buffers + frontier frames, all <= a few
      // |V|); a per-round edge exchange would add >= dirE * rounds/2
      val budget = 2 * dirE + maxRounds.toLong * 6 * nV
      assert(recs.get() <= budget,
        s"shuffle records ${recs.get()} exceed the pinned-layout budget " +
          s"$budget — an |E|-sized frame is being exchanged per round")
    } finally sc.removeSparkListener(listener)
  }
}
