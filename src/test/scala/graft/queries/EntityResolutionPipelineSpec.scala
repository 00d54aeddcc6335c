package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.graft.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** Engine-internal replay for the q331 golden-record gate: rerun alias
  * planting, trigram blocking, the JW + length match rule (through the
  * same [[JaroWinkler.ppm]] kernel the gate's expression calls), a
  * union-find closure, and the canonical pick in plain Scala, and require
  * the gate's entity table to match exactly. Also asserts the empirical
  * recall claim: every planted alias resolves into its own original's
  * entity (the worst deletion case scores 965,359 ppm, over the
  * 960,000 cut). */
class EntityResolutionPipelineSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q331 golden records replay; planted-alias recall is 1.0") {
    import spark.implicits._
    val out = SparkEntry.queries("q331_entity_resolution")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("n_aliases"),
          r.getAs[String]("canonical_name")))).toMap
    assert(out.nonEmpty)

    val base = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val recs = base.map { case (k, n) => (k, n) } ++
      base.filter(_._1 % 13 == 0).map { case (k, n) =>
        val p = (9 + k % 7).toInt // 1-based deletion position
        (k + 1000000000L, n.substring(0, p - 1) + n.substring(p))
      }
    val byBlk = recs.groupBy { case (_, n) => n.takeRight(3) }
    val edges = byBlk.values.flatMap { rs0 =>
      val rs = rs0.toSeq
      for {
        a <- rs; b <- rs
        if a._1 < b._1 && a._2.length != b._2.length &&
          JaroWinkler.ppm(UTF8String.fromString(a._2),
            UTF8String.fromString(b._2)) >= 960000L
      } yield (a._1, b._1)
    }.toSeq
    // union-find
    val parent = scala.collection.mutable.Map(recs.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rbb) = (find(a), find(b))
      if (ra != rbb) parent(math.max(ra, rbb)) = math.min(ra, rbb)
    }
    val nameOf = recs.toMap
    val want = recs.groupBy(r => find(r._1)).map { case (root, members) =>
      root -> ((members.length.toLong,
        members.count(_._1 >= 1000000000L).toLong, nameOf(root)))
    }
    assert(out == want, "entity-resolution replay diverged")

    // structural recall: every alias shares an entity with its original
    base.filter(_._1 % 13 == 0).foreach { case (k, _) =>
      assert(find(k + 1000000000L) == find(k),
        s"alias of customer $k not resolved to its original")
    }
    // the closure must do real work (some entity holds >= 2 records)
    assert(want.values.exists(_._1 >= 2L))
  }
}
