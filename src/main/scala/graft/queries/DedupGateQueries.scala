package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end gates for the production dedup APIs in [[graft.dedup.Dedup]]:
  * where q26/q27/q31/q67 gate the candidate-pair pipelines and the
  * component resolution separately, q68/q69 gate the FINAL deduplicated
  * corpus those APIs hand back — candidate generation, exact re-check,
  * group closure, and min-id survivor selection composed, hash-compared
  * against a DuckDB oracle that recomputes the whole chain (recursive-CTE
  * transitive closure + min-id survivor).
  */
object DedupGateQueries extends QueryModule {

  /** q68: `Dedup.nearMinhash` end to end on the documents corpus — the
    * surviving rows after MinHash+LSH near-dup removal (3-gram shingles,
    * 8 overlapping-md5-window bands, >= 2 agreeing bands; min-doc_id
    * survivor per connected group). Same edge definition as q27/q67 (the
    * shared band-pair semantics), so the oracle reuses their CTEs and
    * appends the closure + survivor filter. */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.dedup.Dedup.nearMinhash(Tables.documents(s, dir), "doc_id", "text")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }
  private val q68Sql =
    s"""${TextDedupQueries.shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |${TextDedupQueries.minhashPairsSqlCtes},
      |edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
      |  UNION SELECT doc_b, doc_a FROM pr),
      |reach AS (
      |  SELECT s AS id, s AS r FROM edges
      |  UNION
      |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s
      |),
      |comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
      |SELECT d.doc_id, d.lang, d.source, d.n_chars
      |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
      |WHERE c.id IS NULL OR c.root = d.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q69: `Dedup.nearCosine` end to end on the embeddings table — the
    * surviving vectors after cosine >= 0.4 near-dup removal. The oracle
    * replicates the BANDED candidate generation too (a pair meets iff all
    * 4 sign bits of at least one of the 16 bands agree), not just the
    * cosine threshold — so the gate pins the API's exact output including
    * its deterministic LSH recall behavior, at any threshold, rather than
    * silently requiring banding to be lossless on this corpus. */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.dedup.Dedup.nearCosine(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.4)
      .select($"vec_id", $"label")
      .orderBy($"vec_id")
  }
  private val q69Sql =
    s"""${VectorQueries.normedSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |bp AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.v AS av, b.v AS bv,
      |    a.nrm AS na, b.nrm AS nb
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |  WHERE len(list_filter(range(0, 16), bb ->
      |    len(list_filter(range(1, 5), j ->
      |      (a.v[bb * 4 + j] >= 0) = (b.v[bb * 4 + j] >= 0))) = 4)) > 0),
      |prs AS (SELECT va, vb FROM bp
      |  WHERE round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, 65), i -> av[i] * bv[i])), (x, y) -> x + y)
      |    / (na * nb), 6) >= 0.4),
      |edges AS (SELECT va AS s, vb AS d FROM prs
      |  UNION SELECT vb, va FROM prs),
      |reach AS (
      |  SELECT s AS id, s AS r FROM edges
      |  UNION
      |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s
      |),
      |comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
      |SELECT em.vec_id, em.label
      |FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.id
      |WHERE c.id IS NULL OR c.root = em.vec_id
      |ORDER BY vec_id""".stripMargin

  /** q106: `Dedup.survivorsBy` end to end — the same MinHash near-dup
    * groups as q68, but keeping each group's LONGEST document (`n_chars`
    * max, min doc_id on ties) instead of the min-id row: the survivor
    * rule production corpus dedup actually wants ("keep the best copy"),
    * gated against the q68 oracle chain with the min-id filter swapped
    * for a per-component ranking window. */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.dedup.Dedup.survivorsBy(docs, "doc_id",
        graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text"),
        "ida", "idb", $"n_chars")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }
  private val q106Sql =
    s"""${TextDedupQueries.shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |${TextDedupQueries.minhashPairsSqlCtes},
      |edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
      |  UNION SELECT doc_b, doc_a FROM pr),
      |reach AS (
      |  SELECT s AS id, s AS r FROM edges
      |  UNION
      |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s
      |),
      |comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
      |rk AS (SELECT d.doc_id, d.lang, d.source, d.n_chars,
      |    row_number() OVER (PARTITION BY coalesce(c.root, d.doc_id)
      |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
      |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
      |SELECT doc_id, lang, source, n_chars FROM rk
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q68_minhash_dedup_corpus", q68, Some(q68Sql)),
    QueryDef("q69_cosine_dedup_corpus", q69, Some(q69Sql)),
    QueryDef("q106_quality_survivor", q106, Some(q106Sql)),
  )
}
