package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics of the gap-fill gates (q99 LOCF, q100 interpolation) beyond
  * hash parity: spine density, null-freeness of the filled series, and the
  * interpolated value's between-neighbors bound. Runs on sf0.001. */
class TimeSeriesFillSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("q99 spine is dense per key and LOCF leaves no nulls") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q99_gapfill_locf")(spark, dir).cache()
    assert(out.count() > 0)
    // every day between a key's min and max is present exactly once
    val spans = out.groupBy($"p")
      .agg(count(lit(1)).as("n"),
        (datediff(max($"day"), min($"day")) + 1).as("span"),
        countDistinct($"day").as("nd"))
      .collect()
    spans.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("span").toLong, s"gap in spine: $r")
      assert(r.getAs[Long]("nd") == r.getAs[Long]("n"), s"dup day: $r")
    }
    // the first row per key is an observation, so LOCF is total
    assert(out.filter($"px_locf".isNull).count() == 0)
    // filled flag marks exactly the non-observation rows
    val obs = out.filter($"filled" === 0).count()
    val daily = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter($"l_partkey" % 100 === 0 && year($"l_shipdate") === 1996)
      .select($"l_partkey", date_trunc("day", $"l_shipdate")).distinct().count()
    assert(obs == daily)
    out.unpersist()
  }

  test("q100 interpolation is total, echoes observations, stays in-range") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q100_interpolate")(spark, dir).cache()
    assert(out.filter($"px_interp".isNull).count() == 0)
    // observed days pass through unchanged (both sides rounded to 6)
    assert(out.filter($"px".isNotNull &&
      abs($"px_interp" - round($"px", 6)) > 1e-9).count() == 0)
    // a linear blend never leaves [min, max] of its two anchors; check the
    // coarser global bound per key
    val bounds = out.filter($"px".isNotNull).groupBy($"p")
      .agg(min($"px").as("lo"), max($"px").as("hi"))
    // half-micro slack: the fixed-point blend rounds to 1e-6 units
    val oob = out.join(bounds, "p")
      .filter($"px_interp" < $"lo" - 1e-6 || $"px_interp" > $"hi" + 1e-6)
    assert(oob.count() == 0)
    out.unpersist()
  }
}
