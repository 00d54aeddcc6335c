package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: per-source mass budgeting, distribution
  * drift between sources, and embedding-space class geometry — the checks
  * a training-data pipeline runs to keep a blended corpus balanced.
  *
  * Exactness strategy: selections and cumulative masses are pure LONG
  * arithmetic (the q100 fixed-point discipline — floor, never round, so no
  * half-way tie can split the engines); doubles appear only in final
  * formulas of already-identical integers.
  */
object CorpusBalanceQueries extends QueryModule {

  /** q123: top-p (nucleus) mass curation — per source, keep the documents
    * carrying the first 90% of character mass, scanning in quality order
    * (n_chars desc, doc_id as the unique tie-break). The keep rule is the
    * integer comparison cum_before·10 < total·9, so membership is exact at
    * any scale. One shuffle on source; the running and whole-partition
    * sums share the same window partitioning. */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"source")
    Tables.documents(s, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("cum", sum($"n_chars").over(wOrd))
      .withColumn("total", sum($"n_chars").over(wAll))
      .filter(($"cum" - $"n_chars") * 10L < $"total" * 9L)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("mass_kept"),
        max($"total").as("mass_total"))
      .orderBy($"source")
  }
  private val q123Sql =
    """WITH r AS (SELECT source, doc_id, n_chars,
      |    CAST(sum(n_chars) OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(n_chars) AS BIGINT) AS mass_kept,
      |  max(total) AS mass_total
      |FROM r WHERE (cum - n_chars) * 10 < total * 9
      |GROUP BY source ORDER BY source""".stripMargin

  /** q225: Simpson diversity of each source's token distribution — the
    * log-free concentration/diversity statistic (Simpson 1949):
    * λ = Σ p², diversity = 1 − λ, effective vocabulary = 1/λ (how many
    * equally-likely tokens the slice behaves like). The corpus-balance
    * metric mixture tuning uses where entropy would need ln (banned by
    * the libm-free determinism rule): λ stays an exact rational —
    * Σ c² / n² over LONG token counts — so the only doubles are two
    * final divisions of exact integers, rounded 8 dp. Shape: one
    * (source, token) count, one Σc² rollup per source — combinable
    * aggregates, no window, no join. */
  private def q225(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum($"c" * $"c").as("sum_c2"))
      .select($"source", $"n_tokens", $"vocab",
        round(lit(1.0) - $"sum_c2".cast("double") /
          ($"n_tokens" * $"n_tokens").cast("double"), 8).as("simpson_diversity"),
        round(($"n_tokens" * $"n_tokens").cast("double") /
          $"sum_c2".cast("double"), 8).as("effective_vocab"))
      .orderBy($"source")
  }
  private val q225Sql =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(c * c) AS BIGINT) AS sum_c2
      |  FROM c GROUP BY 1)
      |SELECT source, n_tokens, vocab,
      |  round(1.0 - CAST(sum_c2 AS DOUBLE)
      |    / CAST(n_tokens * n_tokens AS DOUBLE), 8) AS simpson_diversity,
      |  round(CAST(n_tokens * n_tokens AS DOUBLE)
      |    / CAST(sum_c2 AS DOUBLE), 8) AS effective_vocab
      |FROM s ORDER BY source""".stripMargin

  /** q226: Wasserstein-1 (earth-mover) distance between two sources'
    * document-LENGTH distributions — the drift statistic that, unlike
    * q124's TVD, weighs HOW FAR mass moved (a corpus whose docs all grew
    * 10 tokens drifts a lot in W1, barely in TVD). Uses the 1-D identity
    * W1 = ∫|F_A − F_B|: with integer support, W1·n_A·n_B =
    * Σ_v |cumA(v)·n_B − cumB(v)·n_A| · (next_v − v) — every term exact
    * LONG, one double division at the end (8 dp). The cumsum runs over
    * the LENGTH-VALUE domain (≤ max doc tokens, ~100 cells — the q120
    * tiny-domain precedent), never over documents, so the single-
    * partition window touches a bounded histogram however large the
    * corpus; the data-sized work is one conditional count per value. */
  private def q226(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, dir)
      .filter($"source".isin("src0", "src1"))
      .select($"source", size(split($"text", " ")).cast("long").as("len"))
      .groupBy($"len").agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("ca"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cuma", sum($"ca").over(w))
      .withColumn("cumb", sum($"cb").over(w))
      .withColumn("gap", lead($"len", 1).over(Window.orderBy($"len")) - $"len")
      .where($"gap".isNotNull)
    // totals enter as a 1-row broadcast on a derived-constant key
    // (q145/q143 pattern: BroadcastHashJoin, never BNLJ)
    val totals = cells.agg(sum($"ca").as("n_a"), sum($"cb").as("n_b"))
      .withColumn("one", pmod($"n_a", lit(1L)) * lit(0L))
    cum.withColumn("one", pmod($"len", lit(1L)) * lit(0L))
      .join(broadcast(totals), Seq("one"))
      .agg(first($"n_a").as("n_a"), first($"n_b").as("n_b"),
        sum(abs($"cuma" * $"n_b" - $"cumb" * $"n_a") * $"gap").as("w1s"))
      .select($"n_a", $"n_b",
        round($"w1s".cast("double") / ($"n_a" * $"n_b").cast("double"), 8)
          .as("w1_tokens"))
  }
  private val q226Sql =
    """WITH l AS (SELECT source, len(string_split(text, ' ')) AS len
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |cells AS (SELECT len,
      |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM l GROUP BY len),
      |c AS (SELECT len, sum(ca) OVER wo AS cuma, sum(cb) OVER wo AS cumb,
      |    lead(len) OVER (ORDER BY len) - len AS gap
      |  FROM cells WINDOW wo AS (ORDER BY len ROWS UNBOUNDED PRECEDING)),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(cb) AS BIGINT) AS n_b FROM cells)
      |SELECT t.n_a, t.n_b,
      |  round(CAST(sum(abs(c.cuma * t.n_b - c.cumb * t.n_a) * c.gap) AS DOUBLE)
      |    / CAST(t.n_a * t.n_b AS DOUBLE), 8) AS w1_tokens
      |FROM c CROSS JOIN t WHERE c.gap IS NOT NULL
      |GROUP BY t.n_a, t.n_b""".stripMargin

  /** q124: total-variation distance between two sources' token
    * distributions — the drift statistic for "did this slice's language
    * shift". TVD = ½·Σ_tokens |p_a − p_b|; per-token probabilities are
    * double arithmetic on exact LONG counts (identical per row across
    * engines), each |Δp| is rounded to 8 dp, and the one cross-token
    * accumulation runs through DECIMAL so it is order-independent. Shape:
    * one token-key aggregate with conditional counts — no join between the
    * sources, they meet in the same groupBy row. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .filter($"source".isin("src0", "src1"))
      .select($"source", explode(split($"text", " ")).as("tok"))
    val cells = toks.groupBy($"tok").agg(
      sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
      sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val totals = cells.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      .withColumn("one", pmod($"n1", lit(1L)))
    cells.withColumn("one", pmod($"c1", lit(1L)))
      .join(broadcast(totals), "one")
      .select($"n1", $"n2",
        round(abs($"c1".cast("double") / $"n1".cast("double") -
          $"c2".cast("double") / $"n2".cast("double")), 8).as("dp"))
      .groupBy($"n1", $"n2")
      .agg(count(lit(1)).as("n_vocab"),
        round(sum($"dp".cast("decimal(38,8)")).cast("double") / 2.0, 6).as("tvd"))
  }
  private val q124Sql =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |cells AS (SELECT tok,
      |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM toks GROUP BY tok),
      |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM cells),
      |d AS (SELECT t.n1, t.n2,
      |    round(abs(CAST(c1 AS DOUBLE) / t.n1 - CAST(c2 AS DOUBLE) / t.n2), 8) AS dp
      |  FROM cells, t)
      |SELECT n1, n2, CAST(count(*) AS BIGINT) AS n_vocab,
      |  round(CAST(sum(CAST(dp AS DECIMAL(38,8))) AS DOUBLE) / 2.0, 6) AS tvd
      |FROM d GROUP BY n1, n2""".stripMargin

  /** q125: pairwise cosine similarity between per-label embedding
    * centroids — the class-geometry audit (which labels' embedding
    * clusters overlap?). Every step until the final cosine is LONG-exact:
    * components are fixed-pointed by floor((v+2)·10⁸) (the +2 shift keeps
    * floor = truncation on both engines for negative components, and is
    * un-shifted after the integer mean), centroids are integer means, and
    * dot/norm sums over the 64 dims are exact integer sums. The label
    * pair grid forms on a data-derived constant key (an equi-join the
    * planner hashes — never a nested loop); with |labels| bounded, every
    * frame after the first aggregate is tiny. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comps = Tables.embeddings(s, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .select($"label", $"dim",
        floor(($"v".cast("double") + 2.0) * 1.0e8).cast("long").as("fp"))
    val cent = comps.groupBy($"label", $"dim")
      .agg(expr("sum(fp) div count(1)").as("cfp"))
      .select($"label", $"dim", ($"cfp" - 200000000L).as("c"))
    val a = cent.select($"label".as("label_a"), $"dim", $"c".as("ca"))
    val b = cent.select($"label".as("label_b"), $"dim", $"c".as("cb"))
    val dots = a.join(b, Seq("dim"))
      .filter($"label_a" < $"label_b")
      .groupBy($"label_a", $"label_b")
      .agg(sum($"ca" * $"cb").as("dot"))
    val norms = cent.groupBy($"label").agg(sum($"c" * $"c").as("nrm"))
    dots
      .join(norms.select($"label".as("label_a"), $"nrm".as("na")), "label_a")
      .join(norms.select($"label".as("label_b"), $"nrm".as("nb")), "label_b")
      .select($"label_a", $"label_b",
        round(($"dot".cast("double") / 1.0e16) /
          (sqrt($"na".cast("double") / 1.0e16) * sqrt($"nb".cast("double") / 1.0e16)),
          6).as("cosine"))
      .orderBy($"label_a", $"label_b")
  }
  private val q125Sql =
    """WITH e AS (SELECT label, embedding AS l FROM embeddings),
      |comps AS (SELECT label, CAST(i AS INT) AS dim,
      |    CAST(floor((CAST(l[i] AS DOUBLE) + 2.0) * 100000000.0) AS BIGINT) AS fp
      |  FROM e, UNNEST(range(1, len(l) + 1)) AS t(i)),
      |cent AS (SELECT label, dim,
      |    (CAST(sum(fp) AS BIGINT) // CAST(count(*) AS BIGINT)) - 200000000 AS c
      |  FROM comps GROUP BY 1, 2),
      |dots AS (SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(sum(a.c * b.c) AS BIGINT) AS dot
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2),
      |norms AS (SELECT label, CAST(sum(c * c) AS BIGINT) AS nrm
      |  FROM cent GROUP BY 1)
      |SELECT d.label_a, d.label_b,
      |  round((CAST(dot AS DOUBLE) / 1e16) /
      |    (sqrt(CAST(na.nrm AS DOUBLE) / 1e16) * sqrt(CAST(nb.nrm AS DOUBLE) / 1e16)),
      |    6) AS cosine
      |FROM dots d
      |JOIN norms na ON d.label_a = na.label
      |JOIN norms nb ON d.label_b = nb.label
      |ORDER BY d.label_a, d.label_b""".stripMargin

  /** q248: population stability index per event type — the third leg of
    * the drift triad (q124 total variation, q226 Wasserstein-1): PSI
    * weights each bucket's probability shift by its log-ratio, the
    * industry-standard model-monitoring alarm (>0.25 ≈ retrain). Periods
    * split at the corpus midpoint day; buckets are unit-width integer
    * floors of `value` (engine-portable — no data-dependent bin edges);
    * zero-count buckets get the standard +0.5 smoothing over the bucket
    * UNION so the log never sees 0 (the smoothing is part of the metric's
    * definition here, mirrored exactly in the oracle). Counts are exact;
    * pa/pb are single divisions of exact values; the per-type sum is ≤ a
    * few hundred ln terms, five orders under the 6-dp rounding. One
    * grouped count + one 5-row broadcast of per-type totals. */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"value".isNotNull)
      .select($"event_type", expr("ts div 86400000000000").as("day"),
        floor($"value").cast("long").as("bucket"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val binned = ev.crossJoin(broadcast(mid))
      .groupBy($"event_type", $"bucket")
      .agg(sum(when($"day" < $"mid", 1L).otherwise(0L)).as("ca"),
        sum(when($"day" >= $"mid", 1L).otherwise(0L)).as("cb"))
    val tot = binned.groupBy($"event_type")
      .agg(sum($"ca").as("na"), sum($"cb").as("nb"), count(lit(1)).as("k"))
    val pa = ($"ca".cast("double") + 0.5) /
      ($"na".cast("double") + $"k".cast("double") * 0.5)
    val pb = ($"cb".cast("double") + 0.5) /
      ($"nb".cast("double") + $"k".cast("double") * 0.5)
    binned.join(broadcast(tot), "event_type")
      .select($"event_type", $"na", $"nb", $"k",
        ((pa - pb) * log(pa / pb)).as("term"))
      .groupBy($"event_type")
      .agg(round(sum($"term"), 6).as("psi"), max($"k").as("n_buckets"),
        max($"na").as("n_period_a"), max($"nb").as("n_period_b"))
      .orderBy($"event_type")
  }
  private val q248Sql =
    """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    CAST(floor(value) AS BIGINT) AS bucket
      |  FROM events WHERE value IS NOT NULL),
      |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
      |b AS (SELECT event_type, bucket,
      |    sum(CASE WHEN day < m.mid THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN day >= m.mid THEN 1 ELSE 0 END) AS cb
      |  FROM e, m GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(ca) AS na, sum(cb) AS nb,
      |    count(*) AS k FROM b GROUP BY 1),
      |p AS (SELECT b.event_type, t.na, t.nb, t.k,
      |    (CAST(b.ca AS DOUBLE) + 0.5)
      |      / (CAST(t.na AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)) AS pa,
      |    (CAST(b.cb AS DOUBLE) + 0.5)
      |      / (CAST(t.nb AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)) AS pb
      |  FROM b JOIN t ON b.event_type = t.event_type)
      |SELECT event_type, round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
      |  CAST(max(k) AS BIGINT) AS n_buckets,
      |  CAST(max(na) AS BIGINT) AS n_period_a,
      |  CAST(max(nb) AS BIGINT) AS n_period_b
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q123_top_p_mass", q123, Some(q123Sql)),
    QueryDef("q248_psi_drift", q248, Some(q248Sql)),
    QueryDef("q225_simpson_diversity", q225, Some(q225Sql)),
    QueryDef("q226_wasserstein_drift", q226, Some(q226Sql)),
    QueryDef("q124_token_tvd", q124, Some(q124Sql)),
    QueryDef("q125_centroid_cosine", q125, Some(q125Sql)),
  )
}
