package graft.queries

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Prefix-filtered set-similarity join (AllPairs/PPJoin candidate
  * pruning): the exact-Jaccard scale path. The naive shingle join emits a
  * candidate for EVERY shared shingle — at corpus scale the head of the
  * shingle frequency distribution alone makes that quadratic. Prefix
  * filtering orders each document's shingles by ascending global
  * frequency and emits candidates only from the first
  * |S| − ceil(t·|S|) + 1 of them: any pair with true Jaccard ≥ t is
  * GUARANTEED to share a prefix shingle (pigeonhole on the ≥ ceil(t·|S|)
  * shared shingles), so pruning is lossless — and the oracle proves it,
  * because it computes the NAIVE all-pairs join and the hash compare
  * insists the two candidate sets converge to identical output.
  *
  * Every filter decision is integer-exact: the threshold test is
  * 5·inter ≥ 3·union (t = 3/5 — no float ever decides membership), the
  * prefix length uses ceil(3n/5) = (3n+4) div 5, and the displayed
  * jaccard is a single exact-integer division rounded to 6 dp.
  *
  * Scale: candidates shuffle on the PREFIX shingle key only — rare
  * shingles by construction, so bucket fan-out is bounded where the
  * naive join's is head-heavy; verification joins the (small) candidate
  * pair list back to the shingle table twice, keyed (doc, shingle).
  */
object SimilarityJoinQueries extends QueryModule {

  /** Prefix-filtered exact-Jaccard pair join over an (id, shingle) set
    * relation: every unordered pair with |A∩B| / |A∪B| ≥ tNum/tDen,
    * membership decided entirely in integer arithmetic
    * (inter·tDen ≥ tNum·union). Candidates come only from each set's
    * |S| − ceil(t·|S|) + 1 rarest shingles (ascending global frequency,
    * shingle text as the tie-break) — lossless by pigeonhole, and
    * property-tested against a brute-force reference on random corpora
    * (PrefixJaccardPropertySpec) on top of the q146 oracle gate.
    *
    * Returns (doc_a, doc_b, na, nb, inter) with doc_a < doc_b. */
  def prefixJaccardPairs(sh: DataFrame, idCol: String, shCol: String,
                         tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be in (0, 1]: $tNum/$tDen")
    import sh.sparkSession.implicits._
    val base = sh.select(col(idCol).as("doc_id"), col(shCol).as("shingle"))
    val dfreq = base.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
    val ranked = base.join(dfreq.hint("shuffle_hash"), Seq("shingle"))
      .withColumn("rn", row_number().over(w.orderBy($"df", $"shingle")))
      .withColumn("n_sh", count(lit(1)).over(w))
    // prefix length p = n − ceil(tNum·n/tDen) + 1, all in integers
    val prefix = ranked
      .where($"rn" <= $"n_sh" - expr(s"($tNum * n_sh + $tDen - 1) div $tDen") + 1)
      .select($"doc_id", $"shingle", $"n_sh")
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n_sh".as("na"), $"b.n_sh".as("nb"))
      .distinct()
    cand
      .join(base.select($"doc_id".as("doc_a"), $"shingle").hint("shuffle_hash"), Seq("doc_a"))
      .join(base.select($"doc_id".as("doc_b"), $"shingle").hint("shuffle_hash"), Seq("doc_b", "shingle"))
      .groupBy($"doc_a", $"doc_b", $"na", $"nb")
      .agg(count(lit(1)).as("inter"))
      .where($"inter" * tDen >= ($"na" + $"nb" - $"inter") * tNum)
  }

  /** q146: exact Jaccard ≥ 0.6 pair join via prefix filtering, verified
    * against the naive all-pairs oracle (losslessness gate). */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    prefixJaccardPairs(TextDedupQueries.shingles(s, dir), "doc_id", "shingle", 3L, 5L)
      .select($"doc_a", $"doc_b", $"inter",
        round($"inter" / ($"na" + $"nb" - $"inter").cast("double"), 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }
  private val q146Sql =
    s"""${TextDedupQueries.shinglesSql},
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter,
      |  round(inter / CAST(ca.n_sh + cb.n_sh - inter AS DOUBLE), 6) AS jaccard
      |FROM pairs
      |JOIN cnt ca ON doc_a = ca.doc_id
      |JOIN cnt cb ON doc_b = cb.doc_id
      |WHERE inter * 5 >= (ca.n_sh + cb.n_sh - inter) * 3
      |ORDER BY doc_a, doc_b""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q146_prefix_jaccard", q146, Some(q146Sql)),
  )
}
