package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.DistributedScan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Normalization and concentration-index operators: weighted medians,
  * Herfindahl–Hirschman concentration, and quantile (rank) normalization —
  * the feature-scaling layer between raw facts and model inputs.
  */
object NormalizationQueries extends QueryModule {

  /** q134: volume-weighted median price per part group — the robust VWAP
    * companion (half the traded volume sits below it). The crossing point
    * comes from exact LONG prefix sums of per-price volume at
    * distinct-value granularity through the distributed scan: the weighted
    * median is the smallest price whose inclusive cumulative weight
    * reaches half the total, found with the integer rule 2·cum ≥ total
    * (no division, no ties ambiguity). Price is 2dp money fixed-pointed to
    * cents for the scan order; quantities are integral doubles cast LONG
    * (round-trip exact). */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.lineitem(s, dir)
      .select(($"l_partkey" % 10L).as("grp"),
        round($"l_extendedprice" * 100.0, 0).cast("long").as("price_c"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"grp", $"price_c").agg(sum($"qty").as("w"))
    val scanned = DistributedScan.prefixSums(
      cells, Seq(col("grp"), col("price_c")), Seq("w"))
    val wOff = Window.orderBy($"grp").rowsBetween(Window.unboundedPreceding, -1)
    val offs = cells.groupBy($"grp").agg(sum($"w").as("tot"))
      .withColumn("foff", coalesce(sum($"tot").over(wOff), lit(0L)))
    scanned.join(broadcast(offs), "grp")
      .withColumn("gcum", $"w_cum" - $"foff")
      .filter($"gcum" * 2L >= $"tot")
      .groupBy($"grp")
      .agg(min($"price_c").as("med_c"), max($"tot").as("total_qty"))
      .select($"grp", round($"med_c" / 100.0, 2).as("weighted_median_price"),
        $"total_qty")
      .orderBy($"grp")
  }
  private val q134Sql =
    """WITH cells AS (SELECT l_partkey % 10 AS grp,
      |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |sc AS (SELECT grp, price_c, w,
      |    CAST(sum(w) OVER (PARTITION BY grp ORDER BY price_c) AS BIGINT) AS gcum,
      |    CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tot
      |  FROM cells)
      |SELECT grp,
      |  round(min(price_c) / 100.0, 2) AS weighted_median_price,
      |  max(tot) AS total_qty
      |FROM sc WHERE gcum * 2 >= tot
      |GROUP BY grp ORDER BY grp""".stripMargin

  /** q135: Herfindahl–Hirschman concentration index per region — Σ share²
    * over each nation's revenue share of its region, the market-
    * concentration statistic regulators and portfolio monitors run.
    * Revenue is exact decimal (q01 discipline); shares and their squares
    * are per-row doubles over the |nations|-row aggregate, each 8
    * dp-rounded before the DECIMAL-summed Σ so the one cross-row
    * accumulation is order-independent. */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
    rev
      .withColumn("r_tot", sum($"rev").over(Window.partitionBy($"r_name")))
      .withColumn("sh2", round(
        ($"rev".cast("double") / $"r_tot".cast("double")) *
          ($"rev".cast("double") / $"r_tot".cast("double")), 8))
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_nations"),
        round(sum($"sh2".cast("decimal(38,8)")).cast("double"), 6).as("hhi"))
      .orderBy($"r_name")
  }
  private val q135Sql =
    """WITH rev AS (SELECT r.r_name, n.n_name,
      |    sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |t AS (SELECT r_name, n_name, rev,
      |    sum(rev) OVER (PARTITION BY r_name) AS r_tot FROM rev),
      |s AS (SELECT r_name,
      |    round((CAST(rev AS DOUBLE) / CAST(r_tot AS DOUBLE)) *
      |      (CAST(rev AS DOUBLE) / CAST(r_tot AS DOUBLE)), 8) AS sh2 FROM t)
      |SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
      |  round(CAST(sum(CAST(sh2 AS DECIMAL(38,8))) AS DOUBLE), 6) AS hhi
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** q136: quantile (rank) normalization — map every account balance to
    * its empirical CDF position, the scale-free feature transform. Ranks
    * are mid-rank at distinct-value granularity (cum_before + (c+1)/2, in
    * half-units so everything stays LONG until one final division by
    * 2n), computed through the distributed scan and hash-joined back to
    * rows — no per-row global sort at any point. */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_acctbal")
    val cells = cust.groupBy($"c_acctbal").agg(count(lit(1)).as("cnt"))
    val scanned = DistributedScan.prefixSums(
      cells, Seq(col("c_acctbal")), Seq("cnt"))
    val n = cells.agg(sum($"cnt").as("n"))
      .withColumn("one", pmod($"n", lit(1L)))
    val ranked = scanned.withColumn("one", pmod($"cnt", lit(1L)))
      .join(broadcast(n), "one")
      .select($"c_acctbal",
        round((lit(2L) * $"cnt_cum" - $"cnt" + 1L).cast("double") /
          (lit(2L) * $"n").cast("double"), 8).as("q_norm"))
    cust.join(ranked, "c_acctbal")
      .select($"c_custkey", $"c_acctbal", $"q_norm")
      .orderBy($"c_custkey")
  }
  private val q136Sql =
    """WITH cells AS (SELECT c_acctbal, CAST(count(*) AS BIGINT) AS cnt
      |  FROM customer GROUP BY 1),
      |sc AS (SELECT c_acctbal, cnt,
      |    CAST(sum(cnt) OVER (ORDER BY c_acctbal) AS BIGINT) AS cum
      |  FROM cells),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
      |rk AS (SELECT c_acctbal,
      |    round(CAST(2 * cum - cnt + 1 AS DOUBLE) / (2 * t.n), 8) AS q_norm
      |  FROM sc, t)
      |SELECT c.c_custkey, c.c_acctbal, rk.q_norm
      |FROM customer c JOIN rk ON c.c_acctbal = rk.c_acctbal
      |ORDER BY c.c_custkey""".stripMargin

  /** q301: CROSS-SOURCE quantile matching — map every source's per-doc
    * score distribution onto the POOLED reference distribution's values
    * by rank alignment (the microarray-style "quantile normalization"
    * proper, where q136 maps to CDF positions within one distribution):
    * a doc at within-source rank r of n_s lands on the pooled value at
    * global rank ⌊r·N/n_s⌋. This is the curation step that makes
    * heterogeneous per-source quality scores comparable before one
    * global threshold — without it a global cut keeps whatever source
    * happens to score optimistically. Everything is integer-exact: ranks
    * are row_numbers with (score, doc_id) tie-pins, the target rank is
    * one floor multiply-divide, and the normalized score is a VALUE from
    * the pooled distribution, not an interpolation.
    *
    * Scale shape: the per-source rank is a PARTITIONED window (shuffles
    * on source); the pooled rank — the one data-sized global order — goes
    * through [[DistributedScan.rowNumbers]], never a single-partition
    * window; the alignment is an equi-join on a dense integer rank (no
    * skew possible: ranks are unique). Source sizes ride one broadcast. */
  private def q301(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", $"n_chars")
    val perSrc = docs.withColumn("r", row_number().over(
      Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")))
    val ns = docs.groupBy($"source").agg(count(lit(1)).as("ns"))
    val total = ns.agg(sum($"ns").as("n"))
    val tgt = perSrc.join(broadcast(ns), "source")
      .crossJoin(broadcast(total))
      .withColumn("tr", expr("(r * n) div ns"))
    val pooled = DistributedScan.rowNumbers(
        docs.select($"n_chars".as("gv"), $"doc_id".as("gid")),
        Seq(col("gv"), col("gid")), "gr")
      .select($"gr", $"gv")
    tgt.join(pooled, $"tr" === $"gr")
      .select($"doc_id", $"source", $"n_chars", $"gv".as("norm_chars"))
      .orderBy($"doc_id")
  }
  private val q301Sql =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY source
      |    ORDER BY n_chars, doc_id) AS r FROM d),
      |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
      |  FROM d GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      |g AS (SELECT n_chars AS gv,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS gr FROM d)
      |SELECT r.doc_id, r.source, r.n_chars, g.gv AS norm_chars
      |FROM r JOIN ns USING (source) CROSS JOIN t
      |JOIN g ON g.gr = (r.r * t.n) // ns.ns
      |ORDER BY r.doc_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q134_weighted_median", q134, Some(q134Sql)),
    QueryDef("q135_hhi_concentration", q135, Some(q135Sql)),
    QueryDef("q136_quantile_normalize", q136, Some(q136Sql)),
    QueryDef("q301_quantile_match", q301, Some(q301Sql)),
  )
}
