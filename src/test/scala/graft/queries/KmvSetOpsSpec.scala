package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Engine-internal replay for the q328 KMV set-operations gate: rebuild
  * every per-source sketch, the merged pair synopses, and both the
  * estimated and exact set sizes in plain Scala from the raw documents,
  * and require the gate's output to match exactly. Also asserts the
  * Beyer et al. validity condition the scaladoc claims: whenever both
  * sketches are full, the merged k-th value never exceeds either
  * sketch's own maximum (i.e. the merged k-smallest is a true synopsis
  * of the union). */
class KmvSetOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val K = 128
  private val M48 = 281474976710656L

  private def h48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  test("q328 sketch estimates and exact audit replay from raw rows") {
    import spark.implicits._
    val out = SparkEntry.queries("q328_kmv_set_ops")(spark, dir).collect()
    assert(out.nonEmpty)

    val docs = Tables.documents(spark, dir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets: Map[String, Set[Long]] = docs
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.flatMap { case (_, text) =>
          val t = text.split(" ", -1)
          if (t.length < 3) Seq.empty[Long]
          else (0 to t.length - 3).map(i =>
            h48(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
        }.toSet
      }
    val sk: Map[String, Vector[Long]] =
      sets.map { case (s0, hs) => s0 -> hs.toVector.sorted.take(K) }

    val want = (for {
      sa <- sets.keys; sb <- sets.keys if sa < sb
    } yield {
      val merged = (sk(sa).toSet ++ sk(sb).toSet).toVector.sorted
      val m = math.min(K, merged.length)
      val top = merged.take(m)
      val kth = top.last
      val matches = top.count(v => sk(sa).contains(v) && sk(sb).contains(v))
      val estUnion =
        if (merged.length < K) merged.length.toLong
        else ((K - 1).toLong * M48) / kth
      // validity: full sketches ⇒ merged kth ≤ both sketch maxima
      if (sk(sa).length == K && sk(sb).length == K)
        assert(kth <= sk(sa).last && kth <= sk(sb).last,
          s"merged synopsis invalid for ($sa,$sb)")
      val exactUnion = (sets(sa) ++ sets(sb)).size.toLong
      val exactInter = (sets(sa) & sets(sb)).size.toLong
      (sa, sb) -> ((m.toLong, estUnion, exactUnion,
        ((estUnion - exactUnion) * 1000000L) / exactUnion,
        matches.toLong, (matches.toLong * 1000000L) / m,
        (estUnion * matches) / m, exactInter))
    }).toMap

    val got = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getAs[Long]("m"), r.getAs[Long]("est_union"),
        r.getAs[Long]("exact_union"), r.getAs[Long]("union_err_ppm"),
        r.getAs[Long]("matches"), r.getAs[Long]("jacc_ppm"),
        r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter")))).toMap
    assert(got == want, "KMV set-ops replay diverged")
  }
}
