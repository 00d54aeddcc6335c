package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the exact-DECIMAL moment family (q89/q116/q120/q132/
  * q134): can a fixed-point LONG rewrite remove the interpreted
  * BigDecimal hot loop while keeping hash exactness?
  *
  * Variants, each computing the same 10 moments (n, Σx ×3, Σx²/Σxy ×6)
  * over lineitem's (quantity, extendedprice, discount):
  *
  *   A decimal38   — the shipped plan: per-row double multiply, cast to
  *                   DECIMAL(38,12), decimal-sum (non-compact BigDecimal
  *                   adds in the agg buffer).
  *   B long2dec    — per-row `round(x·100)` to LONG cents (exact: the
  *                   synthetic columns are 2-dp decimals stored as
  *                   doubles), LONG product (≤1.1e14, exact), cast to
  *                   DECIMAL(38,0) only at the accumulator.
  *   C longsplit   — same LONG products, accumulated as TWO codegen'd
  *                   LONG sums (hi = p >> 20, lo = p & 0xfffff), combined
  *                   into DECIMAL once on the 1-row result. Pure
  *                   whole-stage-codegen hot loop, no decimal anywhere
  *                   per row. Valid while n · 2²⁷ < 2⁶³ (n < 6.8e13 — a
  *                   row-count guard, not a value guard, since cents are
  *                   bounded by the domain).
  *
  * B and C are bit-identical to each other by construction; they differ
  * from A in the last decimal places of Σx² (A squares the DOUBLE and
  * rounds to 12 dp; B/C square the exact cents), so adopting them means
  * rewriting gate + oracle in lockstep. Run 3× each, report walls.
  */
object MomentFixedPointProbe {
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
    spark.sparkContext.setLogLevel("ERROR")

    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def li = graft.Tables.lineitem(spark, sfDir)

    // A: shipped decimal plan
    def variantA() = {
      def s1(c: String) = sum(col(c).cast("decimal(28,10)")).cast("double")
      def s2(a: String, b: String) =
        sum((col(a) * col(b)).cast("decimal(38,12)")).cast("double")
      li.agg(count(lit(1)), s1(cols(0)), s1(cols(1)), s1(cols(2)),
        s2(cols(0), cols(0)), s2(cols(1), cols(1)), s2(cols(2), cols(2)),
        s2(cols(0), cols(1)), s2(cols(0), cols(2)), s2(cols(1), cols(2)))
    }

    // B: long cents, decimal accumulator
    def variantB() = {
      val cents = li.select(
        cols.zipWithIndex.map { case (c, i) =>
          round(col(c) * 100).cast("long").as(s"q$i") }: _*)
      def s1(i: Int) = sum(col(s"q$i").cast("decimal(28,0)")).cast("double")
      def s2(i: Int, j: Int) =
        sum((col(s"q$i") * col(s"q$j")).cast("decimal(38,0)")).cast("double")
      cents.agg(count(lit(1)), s1(0), s1(1), s1(2),
        s2(0, 0), s2(1, 1), s2(2, 2), s2(0, 1), s2(0, 2), s2(1, 2))
    }

    // C: long cents, split hi/lo long accumulators, decimal combine at the end
    def variantC() = {
      val cents = li.select(
        cols.zipWithIndex.map { case (c, i) =>
          round(col(c) * 100).cast("long").as(s"q$i") }: _*)
      def qcol(i: Int) = col(s"q$i")
      def prod(i: Int, j: Int) = qcol(i) * qcol(j)
      def hi(c: Column) = sum(shiftright(c, 20))
      def lo(c: Column) = sum(c.bitwiseAND(lit(0xfffffL)))
      val pairs = Seq((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
      val raw = cents.agg(count(lit(1)).as("n"),
        (Seq(sum(qcol(0)).as("t0"), sum(qcol(1)).as("t1"), sum(qcol(2)).as("t2")) ++
          pairs.zipWithIndex.flatMap { case ((i, j), k) =>
            Seq(hi(prod(i, j)).as(s"h$k"), lo(prod(i, j)).as(s"l$k")) }): _*)
      raw.select(col("n") +: col("t0") +: col("t1") +: col("t2") +:
        pairs.indices.map(k =>
          (col(s"h$k").cast("decimal(38,0)") * 1048576L + col(s"l$k"))
            .cast("double").as(s"m$k")): _*)
    }

    def time(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      (1 to 3).foreach { r =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"$name run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      f().show(1, truncate = false)
    }
    time("A_decimal38", variantA _)
    time("B_long2dec", variantB _)
    time("C_longsplit", variantC _)
    spark.stop()
  }
}
