package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Corpus-modeling operators a training-data pipeline runs between dedup
  * and shard-writing: semantic clustering (k-means over the embedding
  * column), statistical token-rarity scoring, tokenizer induction
  * (BPE-style adjacent-pair counting), and source-mixture reweighting.
  * The reference stops at per-symbol aggregation (notebooks/gold/
  * 03_aggregate_gold.py); these extend the same declarative engine to the
  * corpus-preparation jobs described in SURVEY §6.
  *
  * Numeric determinism: distances and centroid sums go through
  * DECIMAL(15,12) per-term casts, so cross-row accumulation is exact and
  * associative (partitioning-independent) on both engines; every emitted
  * double is either integer-valued or a single division of exact
  * integers rounded to 6 dp. Precision 15 keeps each per-term decimal
  * inside Spark's compact Long-backed representation (≤ 18 digits)
  * rather than the BigDecimal path, and rounding to scale 12 is applied
  * identically by both engines, so the labeling stays bit-identical
  * cross-engine.
  *
  * Scale notes: k-means assignment is map-only (the k*dims centroid
  * model enters as literals — the MLlib discipline); each Lloyd round is
  * one scan + one (cluster, dim)-keyed aggregate regardless of corpus
  * size, and the only driver traffic is the k*dims model per round —
  * bounded, never data-sized. Rarity/pair counting are one explode + one
  * hash agg — the same shape as the q61 TF-IDF pipeline.
  */
object CorpusModelQueries extends QueryModule {

  private val D = "decimal(15,12)"

  /** (vec_id, i, v) cell relation — the oracle's replay of the vector
    * column (the Spark side assigns map-only from driver-held centroids;
    * see kmeansAssign). */
  private val cellsSql =
    """cells AS (SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(range(1, 65)) AS t(i))""".stripMargin

  /** Per-row argmin over a driver-held centroid set: squared L2 with each
    * TERM cast to DECIMAL(15,12) before the (exact, order-free) fold, so
    * the distances are bit-identical to the oracle's relational
    * sum(CAST(... AS DECIMAL(15,12))) — same values, same (d, cid)
    * tie-break, same labels. Map-only: no join, no shuffle. */
  private def argminCid(vecCol: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val dists = centroids.map { case (cid, cv) =>
      val carr = array(cv.map(lit(_)).toIndexedSeq: _*)
      // accumulator precision 18 keeps every partial sum on Decimal's
      // Long-backed fast path (≤ 18 digits — no BigDecimal allocation per
      // term); 6 integer digits hold the worst-case fold (64 terms ≤ 4
      // each) with 5 digits to spare, and the value is exact either way
      val d = aggregate(
        zip_with(vecCol, carr, (x, c) => ((x - c) * (x - c)).cast(D)),
        lit(0L).cast("decimal(18,12)"),
        (acc, t) => (acc + t).cast("decimal(18,12)"))
      struct(d, lit(cid))
    }
    if (dists.length == 1) lit(centroids.head._1)
    else least(dists.toIndexedSeq: _*)
      .cast("struct<d:decimal(18,12),j:int>").getField("j")
  }

  /** The 2-round Lloyd assignment (vec_id, cid), k=8, seeded with the 8
    * smallest vec_ids' vectors — shared by q142 (the raw labeling) and
    * q147 (cluster-balanced selection). Distances, re-averaged
    * centroids, and tie-breaks are all exact, so the assignment is
    * engine- and partitioning-invariant AND equal to the oracle's
    * all-relational replay. Shape is the MLlib/graft.ml.KMeans
    * discipline: the model (k·dims doubles — bounded, never data-sized)
    * rides the driver between rounds and enters each assignment as
    * literals in a map-only expression, so a round is one scan + one
    * (cid, dim)-keyed aggregate instead of a broadcast join and two
    * wide aggs (measured q142 4.5 -> 2.4 s, q147 5.0 -> 1.9 s warm at
    * sf0.1). */
  /** Typed-map twin of [[argminCid]] for the hot assignment pass: the
    * same per-term DECIMAL(15,12) rounding (Spark's double→decimal cast
    * is BigDecimal.valueOf + setScale(12, HALF_UP); replayed verbatim
    * here) accumulated as exact scaled longs, in a tight loop instead of
    * an interpreted HOF fold. Centroids iterate in ascending cid with a
    * strict-< test, so ties keep the lowest cid — the (d, cid) order. */
  private def assignMapped(emb: DataFrame,
                           centroids: Seq[(Int, Array[Double])]): DataFrame = {
    import emb.sparkSession.implicits._
    val cents = centroids.sortBy(_._1).toArray
    emb.as[(Long, Array[Double])].map { case (id, v) =>
      var bj = -1
      var bd = Long.MaxValue
      var ci = 0
      while (ci < cents.length) {
        val cv = cents(ci)._2
        var d = 0L
        var i = 0
        while (i < v.length) {
          val t = (v(i) - cv(i)) * (v(i) - cv(i))
          d += java.math.BigDecimal.valueOf(t)
            .setScale(12, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValue()
          i += 1
        }
        if (d < bd) { bd = d; bj = cents(ci)._1 }
        ci += 1
      }
      (id, bj)
    }.toDF("vec_id", "cid")
  }

  /** The embeddings frame plus the round-2 centroid model (k·dims —
    * bounded driver traffic), shared by the assignment (q142/q147) and
    * the silhouette audit (q263). */
  private def kmeansModel(s: SparkSession, dir: String): (DataFrame, Seq[(Int, Array[Double])]) = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    // k=8 seed vectors: bounded driver traffic, like every round's model
    val seeds: Seq[(Int, Array[Double])] = emb.orderBy($"vec_id").limit(8)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }.toSeq
    val a1 = emb.withColumn("cid", argminCid($"v", seeds))
    // re-average in decimal (exact) — k*dims cells back to the driver
    val c1: Seq[(Int, Array[Double])] = a1
      .select($"cid", posexplode($"v").as(Seq("i0", "cv")))
      .groupBy($"cid", $"i0")
      .agg((sum($"cv".cast(D)).cast("double") / count(lit(1))).as("cv"))
      .collect()
      .groupBy(_.getInt(0)).toSeq
      .map { case (cid, rows) =>
        val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
        cid -> Array.tabulate(dims.size)(dims(_))
      }
      .sortBy(_._1)
    (emb, c1)
  }

  private def kmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val (emb, c1) = kmeansModel(s, dir)
    assignMapped(emb, c1)
  }

  /** [[assignMapped]] keeping the TWO nearest centroids and their exact
    * 1e-12-scaled long distances — the inputs the silhouette needs. Slot
    * updates use the same strict-< on ascending cid, so (cid1, cid2) are
    * exactly ranks 1 and 2 of the oracle's ORDER BY d, cid. */
  private def assignTop2(emb: DataFrame,
                         centroids: Seq[(Int, Array[Double])]): DataFrame = {
    import emb.sparkSession.implicits._
    val cents = centroids.sortBy(_._1).toArray
    emb.as[(Long, Array[Double])].map { case (id, v) =>
      var b1 = -1; var d1 = Long.MaxValue
      var b2 = -1; var d2 = Long.MaxValue
      var ci = 0
      while (ci < cents.length) {
        val cv = cents(ci)._2
        var d = 0L
        var i = 0
        while (i < v.length) {
          val t = (v(i) - cv(i)) * (v(i) - cv(i))
          d += java.math.BigDecimal.valueOf(t)
            .setScale(12, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValue()
          i += 1
        }
        if (d < d1) { b2 = b1; d2 = d1; b1 = cents(ci)._1; d1 = d }
        else if (d < d2) { b2 = cents(ci)._1; d2 = d }
        ci += 1
      }
      (id, b1, d1, b2, d2)
    }.toDF("vec_id", "cid1", "d1", "cid2", "d2")
  }

  private def q142(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    kmeansAssign(s, dir)
      .select($"vec_id", $"cid".cast("int").as("cluster")).orderBy($"vec_id")
  }
  /** The CTE stack up to the round-2 assignment `a2` — shared by the q142
    * and q147 oracles. */
  private val kmeansCtes =
    s"""$cellsSql,
      |seeds AS (SELECT vec_id, rn - 1 AS cid FROM (
      |    SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
      |    FROM embeddings) WHERE rn <= 8),
      |c0 AS (SELECT s.cid AS cid, c.i AS i, c.v AS cv
      |  FROM seeds s JOIN cells c ON s.vec_id = c.vec_id),
      |d1 AS (SELECT c.vec_id AS vec_id, k.cid AS cid,
      |    sum(CAST((c.v - k.cv) * (c.v - k.cv) AS DECIMAL(15,12))) AS d
      |  FROM cells c JOIN c0 k ON c.i = k.i GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
      |  FROM d1) WHERE rk = 1),
      |c1 AS (SELECT a.cid AS cid, c.i AS i,
      |    CAST(sum(CAST(c.v AS DECIMAL(15,12))) AS DOUBLE) / count(*) AS cv
      |  FROM a1 a JOIN cells c ON a.vec_id = c.vec_id GROUP BY 1, 2),
      |d2 AS (SELECT c.vec_id AS vec_id, k.cid AS cid,
      |    sum(CAST((c.v - k.cv) * (c.v - k.cv) AS DECIMAL(15,12))) AS d
      |  FROM cells c JOIN c1 k ON c.i = k.i GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
      |  FROM d2) WHERE rk = 1)""".stripMargin
  private val q142Sql =
    s"""WITH $kmeansCtes
      |SELECT vec_id, CAST(cid AS INT) AS cluster FROM a2
      |ORDER BY vec_id""".stripMargin

  /** q213: BPE merge APPLICATION — the other half of tokenizer induction
    * (q144 mines the merge table; this encodes the corpus with it). The
    * top-30 cross-word pairs (a ≠ b; self-pairs excluded — see
    * [[org.apache.spark.sql.graft.BpeEncode]] for why) become the
    * rank-ordered rule table; encoding is then a PER-ROW native
    * expression with the rules embedded as a literal — the broadcast-
    * rules shape: the driver collects exactly 30 bounded rows (never
    * data-sized), and the encode pass itself is zero-shuffle,
    * embarrassingly parallel — how tokenization must run at 100 TB.
    * The DuckDB oracle replays greedy BEST-FIRST rounds (a recursive CTE
    * picking the best-ranked present pair per doc per round), so the
    * hash gate also proves the rank-order-exhaustive ≡ best-first
    * equivalence the expression's single-level-rules argument claims. */
  private def q213(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
    val ranks = toks
      .where(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))"))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .where($"a" =!= $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b").limit(30)
      .select($"a", $"b").collect()                 // bounded: exactly <=30 rows
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val enc = graft.functions.bpe.encode($"w", ranks)
    toks.select($"doc_id", size($"w").cast("long").as("n_before"), enc.as("enc"))
      .select($"doc_id", $"n_before", size($"enc").cast("long").as("n_after"),
        concat_ws("\u001f", $"enc").as("encoded"))
      .orderBy($"doc_id")
  }
  /** q318: TOKENIZER FERTILITY audit — the per-source tokens-per-word and
    * chars-per-token ratios every tokenizer rollout is judged by (high
    * fertility on a source means the vocab underserves it — the signal
    * that drives vocab-budget reallocation, cf. UniMax-style balancing
    * q283 does on the DATA side; this audits the TOKENIZER side). Encodes
    * the corpus with the same mined top-30 merge table as q213 (the
    * native zero-shuffle [[org.apache.spark.sql.graft.BpeEncode]] pass),
    * then one grouped aggregate per source; ratios are exact half-up ppm
    * over the corpus-level sums (NOT averages of per-doc ratios — the
    * aggregation-order trap fertility numbers usually hide). The oracle
    * replays the full best-first recursive encode and the same integer
    * arithmetic. */
  private def q318(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars", split($"text", " ").as("w"))
    val ranks = docs
      .where(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))"))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .where($"a" =!= $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b").limit(30)
      .select($"a", $"b").collect()                 // bounded: exactly <=30 rows
      .map(r => (r.getString(0), r.getString(1))).toSeq
    docs.select($"source", $"n_chars",
        size($"w").cast("long").as("nb"),
        size(graft.functions.bpe.encode($"w", ranks)).cast("long").as("na"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"nb").as("words"),
        sum($"na").as("tokens"), sum($"n_chars").as("chars"))
      .select($"source", $"n_docs", $"words", $"tokens", $"chars",
        expr("(2000000 * tokens + words) div (2 * words)").as("fertility_ppm"),
        expr("(2000000 * chars + tokens) div (2 * tokens)")
          .as("chars_per_token_ppm"))
      .orderBy($"source")
  }
  private val q318Sql =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT w[s.i] AS a, w[s.i + 1] AS b
      |  FROM t, UNNEST(range(1, len(w))) AS s(i) WHERE len(w) >= 2),
      |ranks AS (
      |  SELECT a, b, row_number() OVER (ORDER BY count(*) DESC, a, b) AS rk
      |  FROM p WHERE a <> b GROUP BY a, b
      |  ORDER BY count(*) DESC, a, b LIMIT 30),
      |state(doc_id, round, toks) AS (
      |  SELECT doc_id, 0, w FROM t
      |  UNION ALL
      |  SELECT s.doc_id, s.round + 1,
      |    list_filter(list_transform(range(1, len(s.toks) + 1),
      |      x -> CASE
      |        WHEN x < len(s.toks) AND s.toks[x] = br.a AND s.toks[x+1] = br.b
      |          THEN s.toks[x] || ' ' || s.toks[x+1]
      |        WHEN x > 1 AND s.toks[x-1] = br.a AND s.toks[x] = br.b
      |          THEN NULL
      |        ELSE s.toks[x] END),
      |      e -> e IS NOT NULL)
      |  FROM state s JOIN LATERAL (
      |    SELECT r.a, r.b FROM ranks r
      |    WHERE list_contains(
      |      list_transform(range(1, len(s.toks)),
      |        i -> s.toks[i] || chr(31) || s.toks[i+1]),
      |      r.a || chr(31) || r.b)
      |    ORDER BY r.rk LIMIT 1) br ON true),
      |fin AS (SELECT doc_id, arg_max(toks, round) AS toks
      |  FROM state GROUP BY doc_id),
      |agg AS (SELECT d.source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(t.w)) AS BIGINT) AS words,
      |    CAST(sum(len(f.toks)) AS BIGINT) AS tokens,
      |    CAST(sum(d.n_chars) AS BIGINT) AS chars
      |  FROM fin f JOIN t ON f.doc_id = t.doc_id
      |  JOIN documents d ON d.doc_id = f.doc_id
      |  GROUP BY 1)
      |SELECT source, n_docs, words, tokens, chars,
      |  (2000000 * tokens + words) // (2 * words) AS fertility_ppm,
      |  (2000000 * chars + tokens) // (2 * tokens) AS chars_per_token_ppm
      |FROM agg ORDER BY source""".stripMargin

  private val q213Sql =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT w[s.i] AS a, w[s.i + 1] AS b
      |  FROM t, UNNEST(range(1, len(w))) AS s(i) WHERE len(w) >= 2),
      |ranks AS (
      |  SELECT a, b, row_number() OVER (ORDER BY count(*) DESC, a, b) AS rk
      |  FROM p WHERE a <> b GROUP BY a, b
      |  ORDER BY count(*) DESC, a, b LIMIT 30),
      |state(doc_id, round, toks) AS (
      |  SELECT doc_id, 0, w FROM t
      |  UNION ALL
      |  SELECT s.doc_id, s.round + 1,
      |    list_filter(list_transform(range(1, len(s.toks) + 1),
      |      x -> CASE
      |        WHEN x < len(s.toks) AND s.toks[x] = br.a AND s.toks[x+1] = br.b
      |          THEN s.toks[x] || ' ' || s.toks[x+1]
      |        WHEN x > 1 AND s.toks[x-1] = br.a AND s.toks[x] = br.b
      |          THEN NULL
      |        ELSE s.toks[x] END),
      |      e -> e IS NOT NULL)
      |  FROM state s JOIN LATERAL (
      |    SELECT r.a, r.b FROM ranks r
      |    WHERE list_contains(
      |      list_transform(range(1, len(s.toks)),
      |        i -> s.toks[i] || chr(31) || s.toks[i+1]),
      |      r.a || chr(31) || r.b)
      |    ORDER BY r.rk LIMIT 1) br ON true),
      |fin AS (SELECT doc_id, arg_max(toks, round) AS toks
      |  FROM state GROUP BY doc_id)
      |SELECT f.doc_id, CAST(len(t.w) AS BIGINT) AS n_before,
      |  CAST(len(f.toks) AS BIGINT) AS n_after,
      |  array_to_string(f.toks, chr(31)) AS encoded
      |FROM fin f JOIN t ON f.doc_id = t.doc_id
      |ORDER BY f.doc_id""".stripMargin

  /** q245: TRUE multi-level BPE encode ([[org.apache.spark.sql.graft
    * .BpeEncodeMulti]]) — merged tokens are plain concatenations and the
    * rule table contains a COMPOUND rule whose left side is itself a
    * merged token (the vocabulary shape q213's single-level contract
    * rejects): rules = the top-10 mined cross-word pairs plus, at rank
    * 11, (a₁b₁, c) where c is the most frequent token FOLLOWING the
    * rank-1 pair in the corpus — a compound rule that can only fire on
    * rank 1's output and is data-guaranteed to fire (checked: picking a
    * fixed follower like b₁ never fired at gate scale, which would have
    * made the multi-level path vacuous). The oracle replays the
    * identical best-first loop in a
    * recursive CTE (lowest-ranked present rule per round, all
    * occurrences merged simultaneously — equivalent to left-to-right
    * for a ≠ b rules), so the hash match proves the expression's
    * re-search-from-the-top semantics on real data, not just on the
    * property fixtures. Same broadcast-rules scale shape as q213:
    * driver sees exactly 10 bounded rows, encode is zero-shuffle. */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
    val mined = toks
      .where(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))"))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .where($"a" =!= $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b").limit(10)
      .select($"a", $"b").collect()                 // bounded: exactly <=10 rows
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val rules = mined ++ mined.headOption.toSeq.flatMap { case (a1, b1) =>
      toks.where(size($"w") >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 2), " +
            "i -> struct(w[i-1] AS a, w[i] AS b, w[i+1] AS c))")).as("t"))
        .where($"t.a" === a1 && $"t.b" === b1 && $"t.c" =!= lit(a1 + b1))
        .groupBy($"t.c".as("c")).agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"c").limit(1)
        .collect()                                  // bounded: <=1 row
        .map(r => (a1 + b1, r.getString(0)))
    }
    val enc = graft.functions.bpe.encodeMulti($"w", rules)
    toks.select($"doc_id", size($"w").cast("long").as("n_before"), enc.as("enc"))
      .select($"doc_id", $"n_before", size($"enc").cast("long").as("n_after"),
        concat_ws("\u001f", $"enc").as("encoded"))
      .orderBy($"doc_id")
  }
  private val q245Sql =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT w[s.i] AS a, w[s.i + 1] AS b
      |  FROM t, UNNEST(range(1, len(w))) AS s(i) WHERE len(w) >= 2),
      |mined AS (
      |  SELECT a, b, row_number() OVER (ORDER BY count(*) DESC, a, b) AS rk
      |  FROM p WHERE a <> b GROUP BY a, b
      |  ORDER BY count(*) DESC, a, b LIMIT 10),
      |tri AS (SELECT w[s.i] AS a, w[s.i + 1] AS b, w[s.i + 2] AS c
      |  FROM t, UNNEST(range(1, len(w) - 1)) AS s(i) WHERE len(w) >= 3),
      |r1 AS (SELECT a, b FROM mined WHERE rk = 1),
      |fol AS (SELECT tri.c FROM tri, r1
      |  WHERE tri.a = r1.a AND tri.b = r1.b AND tri.c <> r1.a || r1.b
      |  GROUP BY tri.c ORDER BY count(*) DESC, tri.c LIMIT 1),
      |ranks AS (
      |  SELECT a, b, rk FROM mined
      |  UNION ALL
      |  SELECT r1.a || r1.b, fol.c, 11 FROM r1, fol),
      |state(doc_id, round, toks) AS (
      |  SELECT doc_id, 0, w FROM t
      |  UNION ALL
      |  SELECT s.doc_id, s.round + 1,
      |    list_filter(list_transform(range(1, len(s.toks) + 1),
      |      x -> CASE
      |        WHEN x < len(s.toks) AND s.toks[x] = br.a AND s.toks[x+1] = br.b
      |          THEN s.toks[x] || s.toks[x+1]
      |        WHEN x > 1 AND s.toks[x-1] = br.a AND s.toks[x] = br.b
      |          THEN NULL
      |        ELSE s.toks[x] END),
      |      e -> e IS NOT NULL)
      |  FROM state s JOIN LATERAL (
      |    SELECT r.a, r.b FROM ranks r
      |    WHERE list_contains(
      |      list_transform(range(1, len(s.toks)),
      |        i -> s.toks[i] || chr(31) || s.toks[i+1]),
      |      r.a || chr(31) || r.b)
      |    ORDER BY r.rk LIMIT 1) br ON true),
      |fin AS (SELECT doc_id, arg_max(toks, round) AS toks
      |  FROM state GROUP BY doc_id)
      |SELECT f.doc_id, CAST(len(t.w) AS BIGINT) AS n_before,
      |  CAST(len(f.toks) AS BIGINT) AS n_after,
      |  array_to_string(f.toks, chr(31)) AS encoded
      |FROM fin f JOIN t ON f.doc_id = t.doc_id
      |ORDER BY f.doc_id""".stripMargin

  /** q147: cluster-balanced selection — the diversity-sampling step after
    * semantic clustering: cap every k-means cluster at 25 members
    * (smallest vec_id first, a stand-in for any per-item quality rank),
    * so no semantic region floods the sample. The per-cluster quota is
    * q107's source-quota shape applied to LEARNED groups instead of
    * provenance. One extra window over the assignment — selection itself
    * adds no join. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"cid")
    kmeansAssign(s, dir)
      .withColumn("rk", row_number().over(w.orderBy($"vec_id")))
      .withColumn("n_in_cluster", count(lit(1)).over(w))
      .where($"rk" <= 25)
      .select($"cid".cast("int").as("cluster"), $"rk", $"vec_id", $"n_in_cluster")
      .orderBy($"cluster", $"rk")
  }
  private val q147Sql =
    s"""WITH $kmeansCtes,
      |sel AS (SELECT cid, vec_id,
      |    row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rk,
      |    CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_in_cluster
      |  FROM a2)
      |SELECT CAST(cid AS INT) AS cluster, rk, vec_id, n_in_cluster
      |FROM sel WHERE rk <= 25 ORDER BY cluster, rk""".stripMargin

  /** q143: statistical token-rarity quality score — the unigram-LM
    * surprisal filter in integer space: rarity(t) = digits(N) -
    * digits(count(t)) (an exact floor-log10 gap, no libm in the data
    * path), a document scores the mean rarity of its token occurrences.
    * Top 50 rarest-vocabulary docs. One global token agg (broadcast back)
    * + one doc agg — the q61 TF-IDF shuffle shape. */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
    val g = tok.groupBy($"t").agg(count(lit(1)).as("cnt"))
    // data-derived constant key (not a literal, which would constant-fold
    // into a BroadcastNestedLoopJoin): attaches the 1-row total as a
    // BroadcastHashJoin — same trick as q98's bounds attach
    val tot = g.agg(sum($"cnt").as("n_total"))
      .withColumn("one", pmod($"n_total", lit(1L)))
    tok.join(g, Seq("t"))
      .withColumn("one", pmod($"cnt", lit(1L)))
      .join(broadcast(tot), Seq("one"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(length($"n_total".cast("string")) - length($"cnt".cast("string")))
          .as("rarity_sum"))
      .select($"doc_id", $"n_tok", $"rarity_sum",
        round($"rarity_sum" / $"n_tok".cast("double"), 6).as("rarity_score"))
      .orderBy($"rarity_score".desc, $"doc_id").limit(50)
  }
  private val q143Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |g AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY t),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM g),
      |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |    CAST(sum(length(CAST(n_total AS VARCHAR))
      |      - length(CAST(cnt AS VARCHAR))) AS BIGINT) AS rarity_sum
      |  FROM tok JOIN g USING (t) CROSS JOIN tot GROUP BY doc_id)
      |SELECT doc_id, n_tok, rarity_sum,
      |  round(rarity_sum / CAST(n_tok AS DOUBLE), 6) AS rarity_score
      |FROM d ORDER BY rarity_score DESC, doc_id LIMIT 50""".stripMargin

  /** q144: BPE-style merge-candidate mining — count adjacent token pairs
    * corpus-wide, emit the top 30 merge candidates. The inner step of
    * tokenizer induction: each merge round is exactly this query over the
    * re-tokenized corpus. Pair enumeration is a per-row transform (no
    * self-join on position); the count is one hash agg. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .where(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))"))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b").limit(30)
  }
  private val q144Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT w[s.i] AS a, w[s.i + 1] AS b
      |  FROM t, UNNEST(range(1, len(w))) AS s(i) WHERE len(w) >= 2)
      |SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY a, b
      |ORDER BY cnt DESC, a, b LIMIT 30""".stripMargin

  /** q145: source-mixture reweighting — equal-allocation downsampling
    * rates per source: budget = floor(total/k) docs each, rate =
    * min(1, budget/n_docs). The plan every mixture-balanced corpus build
    * starts from; integer-exact except the single emitted ratio. */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, dir)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    // data-derived constant key → BroadcastHashJoin, not BNLJ (see q143)
    val tot = src.agg(sum($"n_docs").as("total"), count(lit(1)).as("nsrc"))
      .withColumn("one", pmod($"nsrc", lit(1L)))
    src.withColumn("one", pmod($"n_docs", lit(1L)))
      .join(broadcast(tot), Seq("one"))
      .select($"source", $"n_docs",
        expr("total div nsrc").as("target_budget"),
        round(least(lit(1.0),
          expr("total div nsrc") / $"n_docs".cast("double")), 6).as("sample_rate"),
        least($"n_docs", expr("total div nsrc")).as("n_after"))
      .orderBy($"source")
  }
  private val q145Sql =
    """WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS nsrc FROM src)
      |SELECT source, n_docs,
      |  total // nsrc AS target_budget,
      |  round(least(1.0, (total // nsrc) / CAST(n_docs AS DOUBLE)), 6) AS sample_rate,
      |  least(n_docs, total // nsrc) AS n_after
      |FROM src CROSS JOIN tot ORDER BY source""".stripMargin

  /** q151: SemDeDup (semantic dedup, Abbas et al. 2023 arXiv:2303.09540) —
    * k-means clusters bound the candidate space, then cosine >= 0.3 pairs
    * WITHIN each cluster mark the larger vec_id as a drop: survivors are
    * vectors with no smaller-id same-cluster neighbor above threshold.
    * This anti-join survivor rule is order-independent (no sequential
    * greedy scan), so the result is partitioning- and engine-invariant.
    *
    * Scale shape: the pairwise stage shuffles on cid only, so cost is
    * sum(|cluster|^2) — the whole point of SemDeDup is that k grows with
    * the corpus (k ~ sqrt(n) in the paper) keeping clusters bounded;
    * gate-k is 8 to stay oracle-replayable. Contrast q69 (global banded
    * LSH): same dedup goal, learned cells instead of sign-bit cells. */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = kmeansAssign(s, dir)
      .join(VectorQueries.normed(s, dir), Seq("vec_id"))
    val a = m.select($"cid", $"vec_id".as("ida"), $"v".as("va"), $"nrm".as("na"))
    val b = m.select($"cid", $"vec_id".as("idb"), $"v".as("vb"), $"nrm".as("nb"))
    val cos = graft.functions.vector.dot($"va", $"vb") / ($"na" * $"nb")
    val dropped = a.join(b.hint("shuffle_hash"), Seq("cid"))
      .where($"ida" < $"idb" && round(cos, 6) >= 0.3)
      .select($"idb".as("vec_id")).distinct()
    m.join(dropped, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cid".cast("int").as("cluster"))
      .orderBy($"vec_id")
  }
  private val q151Sql =
    s"""WITH $kmeansCtes,
      |${VectorQueries.normedSql.replaceFirst("WITH ", "")},
      |m AS (SELECT n.vec_id, a2.cid, n.v, n.nrm
      |  FROM n JOIN a2 ON n.vec_id = a2.vec_id),
      |dropped AS (SELECT DISTINCT b.vec_id AS vec_id
      |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  WHERE round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
      |    / (a.nrm * b.nrm), 6) >= 0.3)
      |SELECT m.vec_id, CAST(m.cid AS INT) AS cluster FROM m
      |LEFT JOIN dropped d ON m.vec_id = d.vec_id WHERE d.vec_id IS NULL
      |ORDER BY m.vec_id""".stripMargin

  /** q160: model-based quality filtering — a linear probe
    * ([[graft.ml.LinearProbe]]) trained by 3 full-batch GD rounds on
    * cheap per-doc features (chars/100, tokens/10, type-token ratio)
    * against an is-English label, then scored over the corpus. The
    * activation is the algebraic fast sigmoid (no exp anywhere), per-row
    * gradient terms are 9 dp-rounded and DECIMAL-summed, and each weight
    * update is one double expression over exact aggregates — so the
    * ENTIRE training loop replays verbatim in the DuckDB oracle and the
    * scores hash-match. Per GD round: one scan + a 4-cell aggregate
    * (map-side partials); scoring is a pure projection. */
  private def featFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .select($"lang",
        array(($"n_chars" / 100.0).as("f1"),
          (size($"toks") / 10.0).as("f2"),
          (size(array_distinct($"toks")).cast("double") / size($"toks")).as("f3"))
          .as("f"),
        when($"lang" === "en", 1.0).otherwise(0.0).as("label"))
  }

  private def q160(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    feat.select($"lang", model.scoreCol($"f").as("score"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"score".cast(DecimalType(28, 9))).cast("double") /
          count(lit(1)), 6).as("mean_score"),
        sum(when($"score" >= 0.5, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy($"lang")
  }
  /** One GD round in SQL: the fast-sigmoid score under the previous
    * weights row, gradient sums, and the same update arithmetic. */
  private def gdRound(prev: String, next: String): String = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    def g(f: String) =
      s"0.5 * CAST(sum(CAST(round(($p - label) * $f, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*)"
    s"""$next AS (SELECT
       |    w.w1 - ${g("f1")} AS w1,
       |    w.w2 - ${g("f2")} AS w2,
       |    w.w3 - ${g("f3")} AS w3,
       |    w.b - 0.5 * CAST(sum(CAST(round($p - label, 9)
       |      AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS b
       |  FROM feat CROSS JOIN $prev w
       |  GROUP BY w.w1, w.w2, w.w3, w.b)""".stripMargin
  }
  private val q160Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    s"""WITH feat AS (SELECT lang,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT lang, $p AS score FROM feat CROSS JOIN wc w)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(CAST(score AS DECIMAL(28,9))) AS DOUBLE)
      |    / count(*), 6) AS mean_score,
      |  CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_flagged
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q201: model evaluation — ROC AUC of the q160 linear probe against
    * its is-English label, via the rank-sum identity with tie midranks:
    * AUC = [Σ_s n_pos(s)·(2·negBelow(s) + n_neg(s))] / (2·N₁·N₀), which
    * counts concordant pairs exactly (ties at the same score worth ½)
    * WITHOUT materializing pairs or ranking rows: group by score, prefix
    * sums over the score-ordered cells ([[DistributedScan.prefixSums]] —
    * never a single-partition window), one aggregate. Scores are the
    * probe's 9 dp-rounded deterministic doubles, so score cells and
    * their order agree across engines; everything after grouping is
    * integer until the final division. The oracle replays training
    * (q160's CTEs) and the same identity with a window prefix sum. */
  /** q221: probe calibration (reliability curve) — q201 grades the
    * probe's RANKING (AUC); this grades its PROBABILITIES: decile-bucket
    * the predicted scores and compare each bucket's mean prediction with
    * its empirical positive rate (the gap column is the reliability
    * diagram a model-based quality filter publishes before its scores
    * are used as sampling weights rather than a threshold). Same
    * replayed training loop as q160/q201; binning is one floor() per
    * row, per-bucket stats are one combinable aggregate; mean
    * predictions DECIMAL-sum the 9 dp scores so bucket means are
    * partitioning-exact. */
  private def q221(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    feat.select($"label", model.scoreCol($"f").as("score"))
      .withColumn("bin", least(lit(9L), floor($"score" * 10).cast("long")))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sum(when($"label" === 1.0, 1L).otherwise(0L)).as("n_pos"),
        round(sum($"score".cast(DecimalType(28, 9))).cast("double") /
          count(lit(1)), 6).as("mean_pred"))
      .withColumn("pos_rate", round($"n_pos".cast("double") / $"n", 6))
      .withColumn("gap", round($"mean_pred" - $"pos_rate", 6))
      .orderBy($"bin")
  }
  private val q221Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    s"""WITH feat AS (SELECT lang,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT label, $p AS score FROM feat CROSS JOIN wc w),
      |b AS (SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
      |    label, score FROM scored)
      |SELECT bin, count(*) AS n,
      |  CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  round(CAST(sum(CAST(score AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6)
      |    AS mean_pred,
      |  round(CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS pos_rate,
      |  round(round(CAST(sum(CAST(score AS DECIMAL(28,9))) AS DOUBLE)
      |      / count(*), 6) -
      |    round(CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*), 6), 6) AS gap
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  }

  private def q201(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    val cells = feat.select($"label", model.scoreCol($"f").as("score"))
      .groupBy($"score")
      .agg(sum(when($"label" === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when($"label" === 0.0, 1L).otherwise(0L)).as("nn"))
    graft.operators.DistributedScan
      .prefixSums(cells, Seq(col("score")), Seq("nn"))
      .agg(
        sum($"np" * (lit(2L) * ($"nn_cum" - $"nn") + $"nn")).as("conc2"),
        sum($"np").as("n1"), sum($"nn").as("n0"))
      .select(
        round($"conc2".cast("double") / (lit(2.0) * $"n1" * $"n0"), 6).as("auc"),
        $"n1", $"n0")
  }
  private val q201Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    s"""WITH feat AS (SELECT lang,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT label, $p AS score FROM feat CROSS JOIN wc w),
      |cells AS (SELECT score,
      |    CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |    CAST(sum(CASE WHEN label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
      |  FROM scored GROUP BY score),
      |c2 AS (SELECT np, nn,
      |    sum(nn) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS nn_cum
      |  FROM cells)
      |SELECT round(CAST(sum(np * (2 * (nn_cum - nn) + nn)) AS DOUBLE)
      |    / (2.0 * sum(np) * sum(nn)), 6) AS auc,
      |  CAST(sum(np) AS BIGINT) AS n1,
      |  CAST(sum(nn) AS BIGINT) AS n0
      |FROM c2""".stripMargin
  }

  /** q269: average precision (area under the precision-recall curve) of
    * the q160 probe — the metric that matters when positives are rare
    * (a quality filter at 1% acceptance: ROC AUC barely moves when the
    * top of the ranking degrades; AP collapses). Same collapsed
    * score-cell + [[DistributedScan.prefixSums]] shape as q201 (never a
    * single-partition window), scanned in DESCENDING score order. Tied
    * scores are graded as a block at the block-end precision (the
    * pessimistic block AP — a deterministic tie contract both engines
    * state identically, where sample-level AP would depend on tie
    * order). Per-cell precision is an integer ppm quotient and the
    * contribution sum is exact long arithmetic (np·10⁶ ≤ 9·10¹⁵ even at
    * 10⁹ positives), so the one double division at the end is the only
    * rounding site. */
  private def q269(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    val cells = feat.select($"label", model.scoreCol($"f").as("score"))
      .groupBy($"score")
      .agg(sum(when($"label" === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when($"label" === 0.0, 1L).otherwise(0L)).as("nn"))
    graft.operators.DistributedScan
      .prefixSums(cells, Seq(col("score").desc), Seq("np", "nn"))
      .withColumn("prec_ppm",
        expr("(np_cum * 1000000) div (np_cum + nn_cum)"))
      .agg(sum($"np" * $"prec_ppm").as("c"),
        sum($"np").as("n1"), sum($"nn").as("n0"))
      .select(
        round($"c".cast("double") / ($"n1" * 1000000.0), 6).as("ap6"),
        $"n1", $"n0")
  }
  private val q269Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    s"""WITH feat AS (SELECT lang,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT label, $p AS score FROM feat CROSS JOIN wc w),
      |cells AS (SELECT score,
      |    CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |    CAST(sum(CASE WHEN label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
      |  FROM scored GROUP BY score),
      |c2 AS (SELECT np, nn,
      |    sum(np) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS np_cum,
      |    sum(nn) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS nn_cum
      |  FROM cells)
      |SELECT round(CAST(sum(np * ((np_cum * 1000000) // (np_cum + nn_cum)))
      |    AS DOUBLE) / (sum(np) * 1000000.0), 6) AS ap6,
      |  CAST(sum(np) AS BIGINT) AS n1,
      |  CAST(sum(nn) AS BIGINT) AS n0
      |FROM c2""".stripMargin
  }

  /** q270: isotonic calibration of the probe — pool-adjacent-violators
    * over 100 score bins, the monotone score→probability map used when
    * probe scores become sampling weights (q221 DIAGNOSES miscalibration;
    * this REPAIRS it — the standard post-hoc calibrator next to Platt
    * scaling). The data-sized step is the one binned aggregate; PAV runs
    * on the driver over the ≤100 collected bins (grid-bounded state, the
    * q259/q262 discipline) with BigInt cross-multiplied pool comparisons
    * — no float ever orders a merge. The oracle cannot express a
    * stack-based PAV, so it replays the MINIMAX characterization
    * iso(i) = max_{j≤i} min_{k≥i} avg(j..k) over bin-range rationals
    * (≤100³/6 ≈ 1.7·10⁵ cells) — mathematically equal to PAV in exact
    * arithmetic, and equal after per-value ppm flooring too because
    * floor is monotone, so it commutes with min and max. A hash match
    * here is therefore a proof that two INDEPENDENT algorithms agree on
    * every pooled value. */
  private def q270(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    val bins = feat.select($"label", model.scoreCol($"f").as("score"))
      .withColumn("bin", least(lit(99L), floor($"score" * 100).cast("long")))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sum(when($"label" === 1.0, 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(bins.length <= 100, s"q270: ${bins.length} bins from a 100-cell grid")
    // PAV: merge while the previous pool's average exceeds the current's.
    final case class Pool(p: BigInt, n: BigInt, members: List[(Long, Long, Long)])
    val stack = scala.collection.mutable.Stack.empty[Pool]
    bins.foreach { case b @ (_, n, p) =>
      var cur = Pool(BigInt(p), BigInt(n), List(b))
      while (stack.nonEmpty && stack.top.p * cur.n > cur.p * stack.top.n) {
        val prev = stack.pop()
        cur = Pool(prev.p + cur.p, prev.n + cur.n, prev.members ++ cur.members)
      }
      stack.push(cur)
    }
    val rows = stack.toList.reverse.flatMap { pool =>
      val ppm = (pool.p * 1000000 / pool.n).toLong
      pool.members.map { case (bin, n, p) =>
        (bin, n, p, ppm / 1000000.0)
      }
    }
    rows.toDF("bin", "n", "n_pos", "iso6").orderBy($"bin")
  }
  private val q270Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    s"""WITH feat AS (SELECT lang,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT label, $p AS score FROM feat CROSS JOIN wc w),
      |b AS MATERIALIZED (SELECT
      |    least(99, CAST(floor(score * 100) AS BIGINT)) AS bin,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM scored GROUP BY 1),
      |pre AS MATERIALIZED (SELECT bin, n, p,
      |    sum(n) OVER (ORDER BY bin) AS cn,
      |    sum(p) OVER (ORDER BY bin) AS cp
      |  FROM b),
      |mins AS (SELECT i.bin AS bin, j.bin AS jb,
      |    min(((k.cp - (j.cp - j.p)) * 1000000)
      |      // (k.cn - (j.cn - j.n))) AS mv
      |  FROM pre i JOIN pre j ON j.bin <= i.bin
      |  JOIN pre k ON k.bin >= i.bin
      |  GROUP BY 1, 2),
      |iso AS (SELECT bin, max(mv) AS ppm FROM mins GROUP BY 1)
      |SELECT b.bin, b.n, b.p AS n_pos, iso.ppm / 1000000.0 AS iso6
      |FROM b JOIN iso USING (bin) ORDER BY bin""".stripMargin
  }

  /** q286: split-conformal prediction interval for the q160 probe — the
    * distribution-free guarantee layer over the score: on a hash-split
    * calibration half, take the ceil(0.9·(n+1))-th smallest
    * nonconformity |label − score| as q̂; conformal theory then promises
    * ≥90% of held-out docs fall within q̂, and the gate MEASURES that
    * coverage on the disjoint eval half (the audit a scorer publishes
    * next to its intervals). The order statistic comes from score-cell
    * counts + [[graft.operators.DistributedScan.prefixSums]] — never a
    * global row_number — and the split is the q60 md5 bucket, so
    * calibration membership survives reruns and resizes. All arithmetic
    * until the final coverage ratio is exact (counts, 9 dp scores);
    * k = ceil is the integer (9(n+1)+9) div 10 in both engines. */
  private def q286(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = featFrame(s, dir)
    val model = graft.ml.LinearProbe.fitGD(feat, "f", "label",
      dims = 3, lr = 0.5, iters = 3)
    val scored = Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        array(($"n_chars" / 100.0), (size($"toks") / 10.0),
          (size(array_distinct($"toks")).cast("double") / size($"toks")))
          .as("f"),
        when($"lang" === "en", 1.0).otherwise(0.0).as("label"))
      .select($"doc_id", $"label", model.scoreCol($"f").as("score"))
      .withColumn("s", abs($"label" - $"score"))
      .withColumn("grp",
        when(CurationQueries.hashBucket("doc_id") % 2 === 0, "calib")
          .otherwise("eval"))
    val cells = scored.filter($"grp" === "calib")
      .groupBy($"s").agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum($"c").as("n_calib"))
      .withColumn("k", expr("(9 * (n_calib + 1) + 9) div 10"))
      .withColumn("one", pmod($"n_calib", lit(1L)))
    val qhat = graft.operators.DistributedScan
      .prefixSums(cells, Seq(col("s")), Seq("c"))
      .withColumn("one", pmod($"c_cum", lit(1L)))
      .join(broadcast(tot), "one")
      .filter($"c_cum" >= $"k")
      .groupBy($"n_calib").agg(min($"s").as("qhat"))
    scored.filter($"grp" === "eval")
      .crossJoin(broadcast(qhat))
      .groupBy($"n_calib", $"qhat")
      .agg(count(lit(1)).as("n_eval"),
        sum(when($"s" <= $"qhat", 1L).otherwise(0L)).as("n_cov"))
      .select($"n_calib", $"n_eval", round($"qhat", 9).as("qhat9"),
        round($"n_cov".cast("double") / $"n_eval", 6).as("coverage6"))
  }
  private val q286Sql = {
    val m = s"(w.b + w.w1 * f1 + w.w2 * f2 + w.w3 * f3)"
    val p = s"round(0.5 + 0.5 * $m / (1.0 + abs($m)), 9)"
    val bucket = CurationQueries.duckBucket("doc_id")
    s"""WITH feat AS (SELECT doc_id,
      |    n_chars / 100.0 AS f1,
      |    len(string_split(text, ' ')) / 10.0 AS f2,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS f3,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label
      |  FROM documents),
      |w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      |${gdRound("w0", "wa")},
      |${gdRound("wa", "wb")},
      |${gdRound("wb", "wc")},
      |scored AS (SELECT doc_id, label, abs(label - $p) AS s,
      |    CASE WHEN $bucket % 2 = 0 THEN 'calib' ELSE 'eval' END AS grp
      |  FROM feat CROSS JOIN wc w),
      |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM scored
      |  WHERE grp = 'calib' GROUP BY s),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_calib,
      |    (9 * (CAST(sum(c) AS BIGINT) + 1) + 9) // 10 AS k FROM cells),
      |sc AS (SELECT s, CAST(sum(c) OVER (ORDER BY s
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_cum FROM cells),
      |qh AS (SELECT t.n_calib, min(sc.s) AS qhat
      |  FROM sc CROSS JOIN tot t WHERE sc.c_cum >= t.k GROUP BY 1)
      |SELECT q.n_calib, CAST(count(*) AS BIGINT) AS n_eval,
      |  round(q.qhat, 9) AS qhat9,
      |  round(CAST(sum(CASE WHEN e.s <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS coverage6
      |FROM scored e CROSS JOIN qh q WHERE e.grp = 'eval'
      |GROUP BY q.n_calib, q.qhat""".stripMargin
  }

  /** q263: per-cluster centroid silhouette — the cluster-quality readout
    * over the q142 assignment: each point's simplified silhouette
    * s = (d₂ − d₁) / max(d₁, d₂) from its two nearest centroids (the
    * centroid-based silhouette that costs k distances per point, not the
    * O(n²) pairwise original — the form that exists at corpus scale).
    * Distances are the assignment's exact 1e-12-scaled longs, s becomes
    * an integer ppm via divide-first renormalization (the q256 idiom —
    * no 1e6 multiply that could overflow), and the per-cluster mean is a
    * double over the exact (Σppm, n) cells, rounded at 6 dp. A cluster
    * whose silhouette sits near 0 is the "re-cluster me" signal the same
    * way q70's per-cell recall is for the IVF index. */
  private def q263(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (emb, c1) = kmeansModel(s, dir)
    assignTop2(emb, c1)
      .withColumn("s_ppm", expr(
        "(d2 - d1) div greatest(greatest(d1, d2) div 1000000, CAST(1 AS BIGINT))"))
      .groupBy($"cid1".cast("int").as("cluster"))
      .agg(count(lit(1)).as("n_points"),
        round(sum($"s_ppm").cast("double") / count(lit(1)) / 1.0e6, 6)
          .as("avg_sil6"))
      .orderBy($"cluster")
  }
  private val q263Sql =
    s"""WITH $kmeansCtes,
      |dl AS (SELECT vec_id, cid,
      |    CAST(d * 1000000000000 AS BIGINT) AS dl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
      |  FROM d2),
      |t1 AS (SELECT vec_id, cid AS cid1, dl AS dv1 FROM dl WHERE rk = 1),
      |t2 AS (SELECT vec_id, dl AS dv2 FROM dl WHERE rk = 2),
      |sp AS (SELECT t1.vec_id, t1.cid1,
      |    (t2.dv2 - t1.dv1) // greatest(greatest(t1.dv1, t2.dv2) // 1000000, 1)
      |      AS s_ppm
      |  FROM t1 JOIN t2 USING (vec_id))
      |SELECT CAST(cid1 AS INT) AS cluster,
      |  CAST(count(*) AS BIGINT) AS n_points,
      |  round(CAST(sum(s_ppm) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_sil6
      |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin

  /** q302: multinomial NAIVE BAYES language classifier — the generative
    * companion to q160's discriminative linear probe: train per-(lang,
    * token) Laplace-smoothed log-likelihoods and per-lang priors on the
    * corpus, score every document in log space, and report the lang ×
    * predicted-lang CONFUSION MATRIX (the self-consistency audit that
    * tells you whether the declared lang labels are even learnable from
    * the token distributions — a label-quality tripwire for corpus
    * intake). Float discipline is q292/q289's: each cell's ln((c+1)/
    * (n_l+V)) is one correctly-rounded double op on exact integer inputs,
    * rounded at 9 dp, and every cross-token sum runs as DECIMAL(38,9) —
    * order-independent, so the per-doc scores compare EXACTLY and the
    * argmax (score DESC, lang ASC tie-pin) is engine-stable.
    *
    * Scale shape: the model is the |langs|·|vocab| grid (bounded —
    * vocabulary-sized, never corpus-sized), built by one grouped count
    * and joined BROADCAST to the exploded token stream; one shuffle
    * aggregates (doc, lang) scores, a per-doc window picks the argmax.
    * No driver loop, no collect: train and predict are both one-pass. */
  private def q302(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("tok"))
    val cls = toks.groupBy($"lang").agg(
      countDistinct($"doc_id").as("n_docs"),
      count(lit(1)).as("n_tok"))
    val vocab = toks.select($"tok").distinct()
    val vSize = vocab.count() // vocabulary-bounded scalar, never data-sized
    val nDocsTotal = Tables.documents(s, dir).count()
    val counts = toks.groupBy($"lang", $"tok").agg(count(lit(1)).as("cnt"))
    val grid = cls.crossJoin(vocab)
      .join(counts, Seq("lang", "tok"), "left")
      .select($"lang".as("m_lang"), $"tok".as("m_tok"),
        round(log((coalesce($"cnt", lit(0L)) + 1L).cast("double") /
          ($"n_tok" + lit(vSize)).cast("double")), 9)
          .cast("decimal(38,9)").as("logp"))
    val prior = cls.select($"lang".as("p_lang"),
      round(log($"n_docs".cast("double") / lit(nDocsTotal.toDouble)), 9)
        .cast("decimal(38,9)").as("logprior"))
    val scored = toks
      .join(broadcast(grid), $"tok" === $"m_tok")
      .groupBy($"doc_id", $"lang", $"m_lang")
      .agg(sum($"logp").as("s"))
      .join(broadcast(prior), $"m_lang" === $"p_lang")
      .select($"doc_id", $"lang", $"m_lang", ($"s" + $"logprior").as("score"))
    val pred = scored.withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"m_lang")))
      .filter($"rk" === 1)
    pred.groupBy($"lang", $"m_lang".as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"pred_lang")
  }
  private val q302Sql =
    """WITH toks AS (SELECT doc_id, lang,
      |    unnest(string_split(text, ' ')) AS tok FROM documents),
      |cls AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1),
      |vocab AS (SELECT DISTINCT tok FROM toks),
      |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |cnts AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |grid AS (SELECT cls.lang AS m_lang, vocab.tok AS m_tok,
      |    CAST(round(ln(CAST(coalesce(cnts.cnt, 0) + 1 AS DOUBLE)
      |      / (cls.n_tok + vs.v)), 9) AS DECIMAL(38,9)) AS logp
      |  FROM cls CROSS JOIN vocab CROSS JOIN vs
      |  LEFT JOIN cnts ON cnts.lang = cls.lang AND cnts.tok = vocab.tok),
      |prior AS (SELECT lang AS p_lang,
      |    CAST(round(ln(CAST(n_docs AS DOUBLE) / nd.n), 9)
      |      AS DECIMAL(38,9)) AS logprior
      |  FROM cls CROSS JOIN nd),
      |scored AS (SELECT t.doc_id, t.lang, g.m_lang,
      |    sum(g.logp) + any_value(p.logprior) AS score
      |  FROM toks t JOIN grid g ON t.tok = g.m_tok
      |  JOIN prior p ON p.p_lang = g.m_lang
      |  GROUP BY 1, 2, 3),
      |pred AS (SELECT doc_id, lang, m_lang, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, m_lang) AS rk
      |  FROM scored)
      |SELECT lang, m_lang AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
      |FROM pred WHERE rk = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q330: unigram-LM Viterbi segmentation — the inference step of a
    * SentencePiece-style unigram tokenizer (Kudo 2018) and the
    * globally-OPTIMAL counterpart to the greedy BPE encoders
    * (q213/q245): a corpus-derived weighted piece vocabulary (top-200
    * character 1–4-grams by frequency, plus every 1-gram so segmentation
    * is total by construction), then a per-row dynamic program choosing
    * the piece sequence maximizing Σ weight·len² — run by the native
    * [[org.apache.spark.sql.graft.UnigramViterbiSeg]] expression
    * (codegen'd single kernel call, vocabulary shared per task binary).
    * The DuckDB oracle replays the SAME DP as 25 materialized round CTEs
    * (one per string position, ≤4 predecessor joins each) with the
    * identical tie rule (score DESC, then longer final piece), so the
    * hash pins every argmax, not just the final score.
    *
    * Scale shape: the vocabulary build is one n-gram explode + grouped
    * count (distinct grams bounded by alphabet⁴, not corpus size) with
    * a top-200 TakeOrderedAndProject; the single small collect is the
    * ≤ 200 + |alphabet| vocabulary rows (growth-bounded by construction,
    * same class as the model pulls in q142/q302). Segmentation itself is
    * a pure per-row projection — embarrassingly parallel, no shuffle. */
  private def q330(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables.customer(s, dir).select($"c_custkey", $"c_name")
    val grams = (1 to 4).map { l =>
      names.filter(length($"c_name") >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(c_name) - $l + 1), " +
            s"i -> substring(c_name, i, $l))")).as("piece"))
    }.reduce(_ unionAll _)
      .groupBy($"piece").agg(count(lit(1)).as("cnt"))
    val top = grams.orderBy($"cnt".desc, $"piece").limit(200)
    val singles = grams.filter(length($"piece") === 1)
    // bounded collect: <= 200 + |alphabet| vocabulary rows by construction
    val vocab = top.unionAll(singles).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    names
      .select($"c_custkey",
        graft.functions.unigram.viterbiSeg($"c_name", vocab).as("sg"))
      .select($"c_custkey",
        array_join($"sg.pieces", "|").as("seg"),
        $"sg.score".as("score"),
        $"sg.n_pieces".cast("long").as("n_pieces"))
      .orderBy($"c_custkey")
  }
  private val q330Sql = {
    val rounds = 25
    val dpCtes = (1 to rounds).map { k =>
      val branches = (1 to math.min(4, k)).map { l =>
        val sep = if (k == l) "''" else "'|'"
        s"""SELECT d.c_custkey, d.c_name,
           |      d.score + v.cnt * ${l * l} AS score,
           |      d.seg || $sep || v.piece AS seg, d.np + 1 AS np,
           |      $l AS l
           |    FROM dp${k - l} d JOIN vocab v
           |      ON v.piece = substr(d.c_name, ${k - l + 1}, $l)
           |    WHERE length(d.c_name) >= $k""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""dp$k AS MATERIALIZED (
         |  SELECT c_custkey, c_name, score, seg, np FROM (
         |    $branches
         |  ) QUALIFY row_number() OVER (PARTITION BY c_custkey
         |      ORDER BY score DESC, l DESC) = 1
         |)""".stripMargin
    }.mkString(",\n")
    val finals = (0 to rounds).map(k =>
      s"SELECT c_custkey, seg, score, CAST(np AS BIGINT) AS n_pieces " +
        s"FROM dp$k WHERE length(c_name) = $k").mkString("\n  UNION ALL ")
    s"""WITH names AS (SELECT c_custkey, c_name FROM customer),
      |pos AS (SELECT c_name,
      |    unnest(generate_series(1, length(c_name))) AS i FROM names),
      |allg AS (
      |  SELECT substr(c_name, i, 1) AS piece FROM pos
      |  UNION ALL SELECT substr(c_name, i, 2) FROM pos
      |    WHERE i + 1 <= length(c_name)
      |  UNION ALL SELECT substr(c_name, i, 3) FROM pos
      |    WHERE i + 2 <= length(c_name)
      |  UNION ALL SELECT substr(c_name, i, 4) FROM pos
      |    WHERE i + 3 <= length(c_name)),
      |grams AS (SELECT piece, CAST(count(*) AS BIGINT) AS cnt
      |  FROM allg GROUP BY 1),
      |topg AS (SELECT piece, cnt FROM grams
      |  ORDER BY cnt DESC, piece LIMIT 200),
      |vocab AS MATERIALIZED (SELECT DISTINCT piece, cnt FROM (
      |  SELECT * FROM topg
      |  UNION ALL SELECT piece, cnt FROM grams WHERE length(piece) = 1)),
      |dp0 AS MATERIALIZED (SELECT c_custkey, c_name,
      |  CAST(0 AS BIGINT) AS score, '' AS seg, 0 AS np FROM names),
      |$dpCtes
      |SELECT * FROM (
      |  $finals
      |) ORDER BY c_custkey""".stripMargin
  }

  /** q334: BPE VOCABULARY TRAINING, end-to-end — the iterative merge-
    * learning loop ([[graft.text.BpeTrain]]) that produces the rule
    * table the encode gates consume: 10 rounds of {corpus-wide adjacent
    * pair count → adopt argmax (cnt DESC, a, b) → advance the corpus by
    * one [[org.apache.spark.sql.graft.BpeMergePass]]}. q144 mines round
    * 1 of this loop; q213/q245/q318 apply a GIVEN table; this learns
    * the table. Output row r carries the adopted rule AND the round's
    * candidate-table witnesses (distinct-pair and total-pair counts),
    * so the hash pins every round's full corpus state trajectory —
    * including multi-level rounds where a rule side is itself a merged
    * token. The DuckDB oracle replays the identical incremental loop as
    * 10 unrolled MATERIALIZED round CTEs (count → argmax-limit-1 →
    * simultaneous non-overlapping merge, exact because a ≠ b).
    *
    * Scale shape: per round ONE map-side-combinable pair-count shuffle
    * + a 1-row reduce; driver traffic is 1 row/round; state recompute
    * is Catalyst-collapsed stacked passes over the pinned base (see
    * BpeTrain's scaladoc for the checkpoint-every-8-rounds posture at
    * cluster scale). */
  private def q334(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
    val (rules, _) = graft.text.BpeTrain.train(base, "w", rounds = 10)
    // bounded by construction: exactly <= 10 learned rows
    rules.map(l => (l.round.toLong, l.a, l.b, l.cnt, l.nPairs, l.totPairs))
      .toDF("round", "a", "b", "cnt", "n_pairs", "tot_pairs")
      .orderBy($"round")
  }
  /** The q334 training replay as a WITH body (t0 + k unrolled rounds of
    * g/m/t CTEs) — shared by q334 (rule-table gate) and q339 (final-
    * state gate). */
  private def bpeTrainCtes(k: Int): String = {
    val roundCtes = (1 to k).map { r =>
      s"""g$r AS MATERIALIZED (
         |  SELECT w[s.i] AS a, w[s.i + 1] AS b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM t${r - 1}, UNNEST(range(1, len(w))) AS s(i)
         |  WHERE len(w) >= 2 AND w[s.i] <> w[s.i + 1]
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (
         |  SELECT a, b, cnt,
         |    (SELECT CAST(count(*) AS BIGINT) FROM g$r) AS n_pairs,
         |    (SELECT CAST(sum(cnt) AS BIGINT) FROM g$r) AS tot_pairs
         |  FROM g$r ORDER BY cnt DESC, a, b LIMIT 1),
         |t$r AS MATERIALIZED (
         |  SELECT doc_id,
         |    list_filter(list_transform(range(1, len(w) + 1), x -> CASE
         |      WHEN x < len(w) AND w[x] = m.a AND w[x + 1] = m.b
         |        THEN w[x] || w[x + 1]
         |      WHEN x > 1 AND w[x - 1] = m.a AND w[x] = m.b THEN NULL
         |      ELSE w[x] END), e -> e IS NOT NULL) AS w
         |  FROM t${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""t0 AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |$roundCtes""".stripMargin
  }

  private val q334Sql = {
    val k = 10
    val finals = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, a, b, cnt, n_pairs, tot_pairs FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeTrainCtes(k)}
      |SELECT * FROM (
      |  $finals
      |) ORDER BY round""".stripMargin
  }

  /** q339: BPE train→tokenize END-TO-END — the trainer's FINAL corpus
    * state (the tokenization after all 10 learned merges, i.e. the
    * second return of [[graft.text.BpeTrain.train]]) under the hash
    * gate, per document. q334 gates the learned RULE table; this gates
    * what the rules DID to the corpus — the pair every tokenizer rollout
    * ships (vocab + retokenized corpus). Deliberately the INCREMENTAL
    * state (one merge pass per round in adoption order), which is the
    * training-time definition; re-encoding from scratch with
    * [[org.apache.spark.sql.graft.BpeEncodeMulti]] agrees except in the
    * adversarial token-collision case (see BpeMergePass's scaladoc) —
    * the distinction this gate makes checkable. Oracle: the same
    * unrolled round CTEs as q334, final SELECT over t10. Scale shape =
    * q334's (the state is the Catalyst-collapsed stacked passes; this
    * query adds one zero-shuffle projection and the output sort). */
  private def q339(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .withColumn("n_before", size($"w").cast("long"))
    val (_, fin) = graft.text.BpeTrain.train(base, "w", rounds = 10)
    fin.select($"doc_id", $"n_before",
        size($"w").cast("long").as("n_after"),
        concat_ws("\u001f", $"w").as("encoded"))
      .orderBy($"doc_id")
  }
  private val q339Sql =
    s"""WITH ${bpeTrainCtes(10)}
      |SELECT t10.doc_id, CAST(len(t0.w) AS BIGINT) AS n_before,
      |  CAST(len(t10.w) AS BIGINT) AS n_after,
      |  array_to_string(t10.w, chr(31)) AS encoded
      |FROM t10 JOIN t0 ON t10.doc_id = t0.doc_id
      |ORDER BY t10.doc_id""".stripMargin

  /** q345: UNIGRAM-LM VOCABULARY TRAINING — the hard-EM induction loop
    * ([[graft.text.UnigramTrain]]) that completes the tokenizer-training
    * matrix: q334 learns a BPE merge table bottom-up; this starts from
    * q330's over-complete seed vocabulary (top-200 char 1–4-grams + all
    * 1-grams, corpus-count weights) and runs 3 rounds of {Viterbi-segment
    * the corpus under the round's weights → re-estimate every piece's
    * weight as its corpus-wide usage count → prune unused multi-grams,
    * keep 1-grams for totality}. Output row = one (round, piece)
    * trajectory point carrying the weight the piece ENTERED the round
    * with and the usage the round assigned it, so the hash pins every
    * round's full model state — the E-step argmaxes (via usage), the
    * M-step re-weighting, and the prune set (via w_in of the next round).
    * The DuckDB oracle replays all 3 rounds exactly: per round a full
    * 20-position Viterbi DP (q330's materialized per-position CTEs with
    * the identical score-DESC-longer-piece tie rule) against that round's
    * vocabulary CTE, then the usage count and the next vocabulary.
    *
    * Scale shape: per round one zero-shuffle codegen'd segmentation
    * projection + one map-side-combinable piece count; driver traffic is
    * the ≤ |vocab| usage rows per round (growth-bounded by construction,
    * q330's model-pull class). The corpus never shuffles. */
  private def q345(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables.customer(s, dir).select($"c_name")
    val traj = graft.text.UnigramTrain.train(names, "c_name", rounds = 3)
    traj.map(p => (p.round.toLong, p.piece, p.wIn, p.nUsed))
      .toDF("round", "piece", "w_in", "n_used")
      .orderBy($"round", $"piece")
  }
  private val q345Sql = {
    val rounds = 3
    val positions = 20
    def dpChain(r: Int): String = {
      val dpCtes = (1 to positions).map { k =>
        val branches = (1 to math.min(4, k)).map { l =>
          val sep = if (k == l) "''" else "'|'"
          s"""SELECT d.c_custkey, d.c_name,
             |      d.score + v.cnt * ${l * l} AS score,
             |      d.seg || $sep || v.piece AS seg, $l AS l
             |    FROM d$r${k - l} d JOIN v$r v
             |      ON v.piece = substr(d.c_name, ${k - l + 1}, $l)
             |    WHERE length(d.c_name) >= $k""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        s"""d$r$k AS MATERIALIZED (
           |  SELECT c_custkey, c_name, score, seg FROM (
           |    $branches
           |  ) QUALIFY row_number() OVER (PARTITION BY c_custkey
           |      ORDER BY score DESC, l DESC) = 1
           |)""".stripMargin
      }.mkString(",\n")
      val finals = (1 to positions).map(k =>
        s"SELECT seg FROM d$r$k WHERE length(c_name) = $k")
        .mkString("\n  UNION ALL ")
      s"""d${r}0 AS MATERIALIZED (SELECT c_custkey, c_name,
        |  CAST(0 AS BIGINT) AS score, '' AS seg FROM names),
        |$dpCtes,
        |sg$r AS MATERIALIZED (
        |  $finals),
        |u$r AS MATERIALIZED (
        |  SELECT piece, CAST(count(*) AS BIGINT) AS n_used FROM (
        |    SELECT unnest(string_split(seg, '|')) AS piece FROM sg$r)
        |  GROUP BY 1),
        |v${r + 1} AS MATERIALIZED (
        |  SELECT piece, n_used AS cnt FROM u$r
        |  UNION ALL
        |  SELECT piece, CAST(0 AS BIGINT) AS cnt FROM grams1
        |  WHERE piece NOT IN (SELECT piece FROM u$r))""".stripMargin
    }
    val finals = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, u.piece AS piece, " +
        s"v.cnt AS w_in, u.n_used AS n_used " +
        s"FROM u$r u JOIN v$r v ON u.piece = v.piece")
      .mkString("\n  UNION ALL ")
    s"""WITH names AS (SELECT c_custkey, c_name FROM customer),
      |pos AS (SELECT c_name,
      |    unnest(generate_series(1, length(c_name))) AS i FROM names),
      |allg AS (
      |  SELECT substr(c_name, i, 1) AS piece FROM pos
      |  UNION ALL SELECT substr(c_name, i, 2) FROM pos
      |    WHERE i + 1 <= length(c_name)
      |  UNION ALL SELECT substr(c_name, i, 3) FROM pos
      |    WHERE i + 2 <= length(c_name)
      |  UNION ALL SELECT substr(c_name, i, 4) FROM pos
      |    WHERE i + 3 <= length(c_name)),
      |grams AS (SELECT piece, CAST(count(*) AS BIGINT) AS cnt
      |  FROM allg GROUP BY 1),
      |grams1 AS (SELECT piece FROM grams WHERE length(piece) = 1),
      |topg AS (SELECT piece, cnt FROM grams
      |  ORDER BY cnt DESC, piece LIMIT 200),
      |v1 AS MATERIALIZED (SELECT DISTINCT piece, cnt FROM (
      |  SELECT * FROM topg
      |  UNION ALL SELECT piece, cnt FROM grams WHERE length(piece) = 1)),
      |${(1 to rounds).map(dpChain).mkString(",\n")}
      |SELECT * FROM (
      |  $finals
      |) ORDER BY round, piece""".stripMargin
  }

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q345_unigram_em_train", q345, Some(q345Sql)),
    QueryDef("q334_bpe_vocab_train", q334, Some(q334Sql)),
    QueryDef("q339_bpe_train_tokenize", q339, Some(q339Sql)),
    QueryDef("q330_unigram_viterbi", q330, Some(q330Sql)),
    QueryDef("q302_naive_bayes", q302, Some(q302Sql)),
    QueryDef("q142_kmeans_assign", q142, Some(q142Sql)),
    QueryDef("q263_cluster_silhouette", q263, Some(q263Sql)),
    QueryDef("q213_bpe_encode", q213, Some(q213Sql)),
    QueryDef("q318_tokenizer_fertility", q318, Some(q318Sql)),
    QueryDef("q245_bpe_encode_multi", q245, Some(q245Sql)),
    QueryDef("q143_token_rarity", q143, Some(q143Sql)),
    QueryDef("q144_bpe_pairs", q144, Some(q144Sql)),
    QueryDef("q145_mixture_reweight", q145, Some(q145Sql)),
    QueryDef("q147_cluster_balanced", q147, Some(q147Sql)),
    QueryDef("q151_semdedup", q151, Some(q151Sql)),
    QueryDef("q160_linear_probe", q160, Some(q160Sql)),
    QueryDef("q221_calibration", q221, Some(q221Sql)),
    QueryDef("q201_model_auc", q201, Some(q201Sql)),
    QueryDef("q269_average_precision", q269, Some(q269Sql)),
    QueryDef("q270_isotonic_calibration", q270, Some(q270Sql)),
    QueryDef("q286_conformal_interval", q286, Some(q286Sql)),
  )
}
