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
  * naive join's is head-heavy; verification attaches a per-doc shingle
  * synopsis (count + array) to each side of the candidate pair and
  * intersects in codegen — no row expansion, no re-aggregate.
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
      .select($"doc_id", $"shingle")
    // Candidates carry ONLY the pair key (guide §2.3 — na/nb are
    // functionally dependent on the ids and re-attach from the synopsis
    // below, so the dedup exchange ships two longs per pair, not four).
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    // Round-15 verification rework (guide §2.3/§2.4): the old path joined
    // every candidate pair back to the shingle relation TWICE — an
    // |pairs|·|avg set| row expansion through two exchanges plus a
    // |pairs|-group re-aggregate. Verification needs each doc's shingle
    // SET once, so build a per-doc synopsis (n, shingle array) with one
    // grouped collect and compute the intersection per pair in codegen
    // (array_intersect is set-semantics, exact on this set relation —
    // the input contract above). The synopsis is |docs| rows: AQE
    // broadcasts it at gate scale; at cluster scale the same plan hash-
    // joins on the id with the pair stream, still with no row expansion
    // and no re-aggregate. inter casts to long: the declared schema.
    val docsets = base.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), collect_list($"shingle").as("arr"))
    cand
      .join(docsets.select($"doc_id".as("doc_a"),
        $"n".as("na"), $"arr".as("arr_a")), Seq("doc_a"))
      .join(docsets.select($"doc_id".as("doc_b"),
        $"n".as("nb"), $"arr".as("arr_b")), Seq("doc_b"))
      .select($"doc_a", $"doc_b", $"na", $"nb",
        size(array_intersect($"arr_a", $"arr_b")).cast("long").as("inter"))
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
