package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Engine-internal replay for the q327 DSIR gate: recompute the hashed
  * bucket counts, add-one likelihood-ratio weights, per-doc scores, and
  * the top-40 resampling pick in plain Scala from the raw documents, and
  * require the gate's output to match exactly — so a regression in the
  * hash, the smoothing, or the integer rounding shows up as a readable
  * value diff rather than a DuckDB hash flip. */
class DsirReweightSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def md5Bucket(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 256L
  }

  test("q327 top-40 picks replay from raw rows; target docs excluded") {
    import spark.implicits._
    val out = SparkEntry.queries("q327_dsir_reweight")(spark, dir).collect()
    assert(out.length > 0 && out.length <= 40)

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tgt = docs.map(_._2).min
    // target-source docs never appear in the resampling pool
    out.foreach(r => assert(r.getAs[String]("source") != tgt))

    val words = docs.map { case (id, src, text) =>
      (id, src, text.split(" ", -1).map(md5Bucket)) }
    val tCnt = new Array[Long](256); val rCnt = new Array[Long](256)
    words.foreach { case (_, src, bs) =>
      val a = if (src == tgt) tCnt else rCnt
      bs.foreach(b => a(b.toInt) += 1L)
    }
    val (tt, rt) = (tCnt.sum, rCnt.sum)
    val w = (0 until 256).map(b =>
      ((tCnt(b) + 1L) * (rt + 256L) * 1000000L) /
        ((rCnt(b) + 1L) * (tt + 256L))).toArray
    val scored = words.filter(_._2 != tgt).map { case (id, src, bs) =>
      (id, src, bs.length.toLong, bs.map(b => w(b.toInt)).sum / bs.length)
    }
    val want = scored.sortBy(t => (-t._4, t._1)).take(40).zipWithIndex
      .map { case ((id, src, n, sc), i) => (i + 1L, id, src, n, sc) }
    val got = out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[String]("source"), r.getAs[Long]("n_words"),
      r.getAs[Long]("score_ppm")))
    assert(got.toSeq == want.toSeq, "DSIR replay diverged")
    // the weights must actually discriminate (not a constant table), or
    // the fixture no longer exercises the likelihood ratio
    assert(w.distinct.length > 1, "degenerate weight table")
  }
}
