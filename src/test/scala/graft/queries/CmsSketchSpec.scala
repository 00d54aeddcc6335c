package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** CMS probe semantics: estimates are exact-or-over (never under), the
  * gated claims hold with the production eps, and a deliberately coarse
  * sketch violates the width bound — proving the claim column is computed,
  * not hardcoded (the q66 negative-path pattern). */
class CmsSketchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q88 claims hold and estimates never undercount") {
    val rows = SparkEntry.queries("q88_cms_heavy_hitters")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("claim_lower"), s"undercount for ${r.getString(0)}")
      assert(r.getAs[Boolean]("claim_within"), s"overshoot for ${r.getString(0)}")
    }
  }

  test("a coarse sketch (huge eps) breaks the tight bound — claim flips") {
    import spark.implicits._
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split($"text", " ")).as("tok"))
    val coarse = toks.agg(
        expr("count_min_sketch(tok, 0.5d, 0.5d, 42)").as("cms"),
        count(lit(1)).as("n_toks"))
      .withColumn("one", pmod($"n_toks", lit(1L)))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("one", pmod($"cnt", lit(1L)))
    val checked = exact.join(broadcast(coarse), "one")
      .withColumn("est", graft.functions.sketches.cmsEstimate($"cms", $"tok"))
    // CMS never undercounts, even coarse
    assert(checked.filter($"est" < $"cnt").count() == 0)
    // but a handful of counters over a whole vocabulary must collide:
    // some token's estimate exceeds the PRODUCTION bound (eps=1e-4 · N)
    val broken = checked
      .filter($"est" > $"cnt" + ceil($"n_toks" * lit(0.0001))).count()
    assert(broken > 0, "coarse sketch unexpectedly met the tight bound — " +
      "the claim would be vacuous")
  }
}
