package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket affinity mining over order line items — the association
  * layer (support / confidence / lift) a merchandising or recommendation
  * pipeline derives from the same fact table the revenue queries read.
  *
  * Reference behavior: the reference's gold layer stops at per-entity
  * aggregates (`sql/example_queries.sql`); this extends the identical
  * lineitem fact to co-occurrence analytics without any new input.
  */
object AffinityQueries extends QueryModule {

  /** q179: top-20 part pairs by basket co-occurrence, with association
    * metrics. Pair mining is a self-join on the order key over the
    * DISTINCT (order, part) item set — fan-out is bounded by per-basket
    * width (TPC-H: ≤ 7 items/order → ≤ 21 pairs), so the candidate stream
    * is O(orders), never O(parts²), and every stage shuffles on a key
    * (order key, then pair). The top-20 cut runs BEFORE the metric joins:
    * TakeOrderedAndProject collapses the pair stream map-side, and the
    * per-part count and basket-total joins then touch 20 rows, each as a
    * broadcast of the tiny side. Metrics are single double expressions
    * over exact LONG counts — all products computed in double (an integer
    * product would overflow BIGINT at warehouse scale; DuckDB would raise,
    * Spark would wrap — both are wrong answers). Ties in the cut are
    * broken by (p1, p2), making the 20 rows unique. */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    // pairs expand from SORTED per-order baskets with higher-order
    // functions — one shuffle (the basket groupBy) instead of the former
    // items⋈items self-join's two-sided shuffle; fan-out per order is
    // identical (|basket| choose 2) either way
    val baskets = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(expr("array_sort(collect_set(l_partkey))").as("ps"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("p"))
      .groupBy($"p.p1".as("p1"), $"p.p2".as("p2"))
      .agg(count(lit(1)).as("pair_n"))
    val top = pairs.orderBy($"pair_n".desc, $"p1", $"p2").limit(20)
    val counts = items.groupBy($"pk").agg(count(lit(1)).as("cnt"))
    val totals = items.agg(countDistinct($"ok").as("t"))
      .withColumn("one", pmod($"t", lit(1L)))
    val withC1 = counts.select($"pk".as("p1"), $"cnt".as("cnt1"))
      .join(broadcast(top), Seq("p1"))
    counts.select($"pk".as("p2"), $"cnt".as("cnt2"))
      .join(broadcast(withC1), Seq("p2"))
      .withColumn("one", pmod($"pair_n", lit(1L)))
      .join(broadcast(totals), "one")
      .select($"p1", $"p2", $"pair_n",
        round($"pair_n".cast("double") / $"t", 6).as("support"),
        round($"pair_n".cast("double") / $"cnt1", 6).as("confidence"),
        round($"pair_n".cast("double") * $"t" /
          ($"cnt1".cast("double") * $"cnt2"), 6).as("lift"))
      .orderBy($"pair_n".desc, $"p1", $"p2")
  }
  private val q179Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |counts AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY pk),
      |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS t FROM items),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS pair_n
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2),
      |top AS (SELECT * FROM pairs ORDER BY pair_n DESC, p1, p2 LIMIT 20)
      |SELECT top.p1, top.p2, top.pair_n,
      |  round(CAST(pair_n AS DOUBLE) / t.t, 6) AS support,
      |  round(CAST(pair_n AS DOUBLE) / c1.cnt, 6) AS confidence,
      |  round(CAST(pair_n AS DOUBLE) * t.t
      |    / (CAST(c1.cnt AS DOUBLE) * c2.cnt), 6) AS lift
      |FROM top
      |JOIN counts c1 ON top.p1 = c1.pk
      |JOIN counts c2 ON top.p2 = c2.pk
      |CROSS JOIN tot t
      |ORDER BY pair_n DESC, p1, p2""".stripMargin

  /** q242: frequent triples, the a-priori step past q179's pairs — top-20
    * 3-itemsets by co-occurrence support (≥ 2 orders). The engine runs the
    * classic two-pass shape: pass 1 keeps items appearing in ≥ 2 baskets
    * (downward closure makes the prune LOSSLESS at the same threshold —
    * every item of a support-2 triple is itself support-2), pass 2 expands
    * 3-combinations as a whole-stage-codegen 3-way equi-join on the
    * basket key over the pruned item stream (pk inequalities in the join
    * conditions ⟺ each triple exactly once) and counts. The oracle is
    * the UNPRUNED 3-way self-join ground truth, so the hash match proves
    * the a-priori prune drops nothing. */
  private def q242(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val freq = items.groupBy($"pk").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 2).select($"pk")
    // triple expansion as a WHOLE-STAGE-CODEGEN 3-way equi-join on the
    // basket key, not nested array transforms: the round-13 shape built
    // C(n,3) structs with three nested higher-order lambdas, which are
    // CodegenFallback (the q246 lesson) AND allocate a sliced subarray
    // per (a,b) pair — measured 2.9 → 2.1 s idle at sf0.1. The three
    // join legs share ONE exchange (identical pruned-items subplans →
    // ReuseExchange), the pk inequalities land in the join condition so
    // each triple materializes exactly once, and the pruned stream keeps
    // the a-priori scale story: legs shrink with the support threshold
    val kept = items.join(freq, Seq("pk"), "left_semi")
    kept.select($"ok", $"pk".as("p1"))
      .join(kept.select($"ok", $"pk".as("p2")), Seq("ok"))
      .filter($"p1" < $"p2")
      .join(kept.select($"ok", $"pk".as("p3")), Seq("ok"))
      .filter($"p2" < $"p3")
      .groupBy($"p1", $"p2", $"p3")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= 2)
      .orderBy($"support".desc, $"p1", $"p2", $"p3")
      .limit(20)
  }
  private val q242Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      |SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3,
      |  CAST(count(*) AS BIGINT) AS support
      |FROM items a
      |JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |JOIN items c ON b.ok = c.ok AND b.pk < c.pk
      |GROUP BY 1, 2, 3 HAVING count(*) >= 2
      |ORDER BY support DESC, p1, p2, p3 LIMIT 20""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q179_market_basket", q179, Some(q179Sql)),
    QueryDef("q242_apriori_triples", q242, Some(q242Sql)),
  )
}
