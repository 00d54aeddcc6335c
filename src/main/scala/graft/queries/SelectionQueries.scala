package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators: multi-objective (skyline) picking, weighted
  * deterministic sampling, and corpus-model scoring — the "which rows make
  * the cut" layer of a training-data pipeline.
  */
object SelectionQueries extends QueryModule {

  /** q118: skyline (Pareto frontier) over parts — minimize p_size,
    * maximize p_retailprice; a part survives iff nothing is at least as
    * good on both axes and strictly better on one. The naive semantics is
    * the O(n²) NOT EXISTS self-join (the oracle runs exactly that); the
    * engine reduces it to per-size maxima (one shuffle on a bounded-
    * cardinality key), a strict prefix-max over the |sizes|-row frame
    * (tiny-table window, cf. q112), and one broadcast join back — linear
    * in the data at any scale. Ties on both axes are mutually
    * non-dominating and all kept, which the max-equality join preserves. */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
    val wPrev = Window.orderBy($"p_size").rowsBetween(Window.unboundedPreceding, -1)
    val sky = p.groupBy($"p_size").agg(max($"p_retailprice").as("maxp"))
      .withColumn("prevmax", max($"maxp").over(wPrev))
      .filter($"prevmax".isNull || $"maxp" > $"prevmax")
      .select($"p_size", $"maxp")
    p.join(broadcast(sky), Seq("p_size"))
      .filter($"p_retailprice" === $"maxp")
      .select($"p_partkey", $"p_name", $"p_size", $"p_retailprice")
      .orderBy($"p_size", $"p_partkey")
  }
  private val q118Sql =
    """SELECT p_partkey, p_name, p_size, p_retailprice FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM part q
      |  WHERE q.p_size <= p.p_size AND q.p_retailprice >= p.p_retailprice
      |    AND (q.p_size < p.p_size OR q.p_retailprice > p.p_retailprice))
      |ORDER BY p_size, p_partkey""".stripMargin

  /** q119: deterministic weighted sampling — priority sampling with an
    * integer key: each document draws a 48-bit uniform from md5(doc_id)
    * and its priority is that draw integer-divided by its weight
    * (n_chars), so heavier documents get proportionally smaller keys; the
    * global top-k by (priority, id) is the sample. Everything is integer
    * arithmetic on a pure function of the id — stable under resharding,
    * re-ingest, engine, and cluster size (the q60 split-column property,
    * extended to weights) — and the selection is a TakeOrderedAndProject,
    * never a global sort. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .withColumn("priority", expr("h div greatest(n_chars, CAST(1 AS BIGINT))"))
      .select($"doc_id", $"n_chars", $"priority")
      .orderBy($"priority", $"doc_id")
      .limit(100)
  }
  /** 48-bit md5 prefix as a BIGINT in DuckDB (no hex-cast builtin) — the
    * q60 digit-arithmetic trick, widened to 12 hex digits. */
  private val duckH48: String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
    (1 to 12).map(i => s"${digit(i)} * ${java.math.BigInteger.valueOf(16L).pow(12 - i)}")
      .mkString("(", " + ", ")")
  }
  private val q119Sql =
    s"""SELECT doc_id, n_chars,
       |  CAST($duckH48 AS BIGINT) // CAST(greatest(n_chars, 1) AS BIGINT) AS priority
       |FROM documents
       |ORDER BY priority, doc_id LIMIT 100""".stripMargin

  /** q121: bigram language-model scoring — train bigram conditional
    * probabilities P(w2|w1) on the corpus itself, then score every
    * document by its average bigram probability. The model is two
    * aggregates (bigram counts, prefix counts); scoring joins each
    * occurrence back to its counts on (w1, w2) then w1 — hash joins on
    * token keys, no driver-side model object, so the "model" scales with
    * the vocabulary, sharded like any other table. Probabilities are kept
    * EXACT as 8-digit fixed-point integers (cnt·10⁸ div prefix — the q100
    * trick), so per-document averages are LONG sums with one final double
    * division; no log/exp whose libm rounding could differ per engine. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val occ = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .withColumn("a", slice($"t", lit(1), size($"t") - 1))
      .withColumn("b", slice($"t", lit(2), size($"t") - 1))
      .select($"doc_id", explode(arrays_zip($"a", $"b")).as("bg"))
      .select($"doc_id", $"bg.a".as("w1"), $"bg.b".as("w2"))
    val bc = occ.groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt_b"))
    val pc = bc.groupBy($"w1").agg(sum($"cnt_b").as("cnt_p"))
    occ.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .withColumn("p_fp", expr("cnt_b * CAST(100000000 AS BIGINT) div cnt_p"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum($"p_fp").cast("double") / (count(lit(1)) * 1.0e8), 6)
          .as("avg_prob"))
      .orderBy($"doc_id")
  }
  private val q121Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |occ AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      |  FROM d, UNNEST(range(1, len(l))) AS t(i)),
      |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt_b FROM occ GROUP BY 1, 2),
      |pc AS (SELECT w1, CAST(sum(cnt_b) AS BIGINT) AS cnt_p FROM bc GROUP BY 1),
      |sc AS (SELECT o.doc_id, (b.cnt_b * 100000000) // p.cnt_p AS p_fp
      |  FROM occ o JOIN bc b USING (w1, w2) JOIN pc p USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(p_fp) AS DOUBLE) / (count(*) * 100000000.0), 6) AS avg_prob
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val coverK = 8

  /** q255: greedy maximum-coverage document selection — the submodular
    * data-curation primitive ("pick the k documents that together cover
    * the most distinct shingles"): k rounds, each selecting the document
    * with the largest MARGINAL gain (new shingles not yet covered),
    * tie-broken by doc_id. The greedy algorithm's (1 − 1/e) guarantee is
    * why this exact loop is the standard subset-selection / dedup-aware
    * sampling kernel (facility location over n-gram features).
    *
    * Scale shape: the covered set and candidate scores stay DISTRIBUTED
    * — per round one anti-join of the (doc, shingle) pairs against the
    * covered shingles, one grouped count, and a driver transfer of
    * EXACTLY ONE row (the argmax) plus one scalar (covered count); never
    * the gains table or the covered set. Everything is integer counts, so
    * the oracle replays the identical k rounds as unrolled CTEs with the
    * same (gain DESC, doc_id) argmax. Rounds where every remaining
    * document has zero marginal gain produce no pick on either side. */
  private def q255(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = TextDedupQueries.shingles(s, dir)
      .select($"doc_id", $"shingle").localCheckpoint(true)
    var covered: DataFrame = null
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (r <- 1 to coverK) {
      val remaining =
        if (covered == null) sh else sh.join(covered, Seq("shingle"), "left_anti")
      val top = remaining.groupBy($"doc_id").agg(count(lit(1)).as("gain"))
        .orderBy($"gain".desc, $"doc_id").limit(1).collect()
      if (top.nonEmpty) {
        val (pick, gain) = (top.head.getLong(0), top.head.getLong(1))
        val newCov = sh.filter($"doc_id" === pick).select($"shingle")
        covered = (if (covered == null) newCov else covered.union(newCov))
          .distinct().localCheckpoint(true)
        picks += ((r.toLong, pick, gain, covered.count()))
      }
    }
    picks.toSeq.toDF("pick_rank", "doc_id", "gain", "covered_cum")
      .orderBy($"pick_rank")
  }
  private val q255Sql = {
    val rounds = (1 to coverK).map { i =>
      val gainSrc =
        if (i == 1) "SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM sh GROUP BY 1"
        else
          s"""SELECT s.doc_id, CAST(count(*) AS BIGINT) AS gain FROM sh s
             |  WHERE NOT EXISTS (SELECT 1 FROM c${i - 1} c
             |                    WHERE c.shingle = s.shingle)
             |  GROUP BY 1""".stripMargin
      val covSrc =
        if (i == 1) s"SELECT DISTINCT s.shingle FROM sh s JOIN p$i USING (doc_id)"
        else
          s"""SELECT shingle FROM c${i - 1}
             |  UNION SELECT s.shingle FROM sh s JOIN p$i USING (doc_id)""".stripMargin
      s"""g$i AS MATERIALIZED ($gainSrc),
         |p$i AS MATERIALIZED (SELECT doc_id, gain FROM g$i ORDER BY gain DESC, doc_id LIMIT 1),
         |c$i AS MATERIALIZED ($covSrc)""".stripMargin
    }.mkString(",\n")
    val out = (1 to coverK).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS pick_rank, doc_id, gain,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$i) AS covered_cum FROM p$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${TextDedupQueries.shinglesSql},
       |$rounds
       |$out
       |ORDER BY pick_rank""".stripMargin
  }

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q118_skyline", q118, Some(q118Sql)),
    QueryDef("q119_weighted_sample", q119, Some(q119Sql)),
    QueryDef("q121_bigram_lm_score", q121, Some(q121Sql)),
    QueryDef("q255_greedy_coverage", q255, Some(q255Sql)),
  )
}
