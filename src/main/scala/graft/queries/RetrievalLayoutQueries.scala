package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval scoring and physical-layout operators: BM25 ranking (the
  * retrieval-quality upgrade over q61's TF-IDF), chunk-level exact dedup
  * (the paragraph/line dedup used on web corpora, expressed over token
  * windows since this corpus has no newlines), space-filling-curve
  * clustering keys (Z-order — the data-skipping layout for multi-column
  * range scans), and two-level HLL sketch merge (the mergeable-sketch
  * cardinality pattern that replaces exact count-distinct at fleet scale).
  *
  * Scale notes (100 TB posture):
  *   - q78 shuffles on (doc, term) then term then doc — the same profile
  *     as q61; the per-doc top-3 rides the bounded TopKScoreStr aggregate
  *     so only 3 rows per doc cross the final exchange. Corpus-level
  *     scalars (N, avgdl) attach via a data-derived constant-key broadcast
  *     join, never a collect.
  *   - q79 is one shuffle on chunk hash + one on doc_id; chunk frequency
  *     is a count over the hash key, so boilerplate-heavy corpora skew at
  *     the hash level, where AQE skew-split applies cleanly.
  *   - q80 is a pure projection (bit interleave) plus one aggregate on the
  *     derived bucket — this is exactly the key computation a writer would
  *     `repartitionByRange` on to lay out 100 TB for 2-D range pruning;
  *     the per-bucket min/max output IS the data-skipping index the layout
  *     earns.
  *   - q81 builds per-group HLL sketches (constant-size state, map-side
  *     combinable) and re-merges the BINARY sketches into a corpus total —
  *     the two-level merge that lets cardinality roll up across partitions
  *     or days without rescanning; the oracle checks the estimates stay
  *     within the declared band of exact counts (q42/q66 one-sided
  *     pattern: a violation hash-fails).
  */
object RetrievalLayoutQueries extends QueryModule {

  /** q78: BM25 top-3 terms per document (k1 = 1.2, b = 0.75). Scores are
    * rounded to 6 dp before ranking so ordering never hinges on the final
    * ulp of ln; ties break on term (matching the oracle's ROW_NUMBER
    * ORDER BY score DESC, tok — TopKScoreStr's comparator contract). */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    // corpus scalars (N, avgdl) in ONE row, broadcast-joined onto the
    // vocabulary and the doc-length table via a data-derived constant key
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))
      .withColumn("one", pmod($"n_docs".cast("long"), lit(1L)))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val idf = df.withColumn("one", pmod($"df", lit(1L)))
      .join(broadcast(stats), "one")
      .select($"tok", log((($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)) + 1.0).as("idf"))
    val withLen = dl.withColumn("one", pmod($"dl", lit(1L)))
      .join(broadcast(stats), "one")
      .select($"doc_id", $"dl", $"avgdl")
    tf.join(idf, "tok").join(withLen, "doc_id")
      .select($"doc_id", $"tok",
        round($"idf" * ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * $"dl" / $"avgdl")), 6)
          .as("score"))
      .groupBy($"doc_id")
      .agg(graft.functions.aggregates.topKByScoreStr($"score", $"tok", 3).as("top"))
      .select($"doc_id", posexplode($"top").as(Seq("rk0", "t")))
      .select($"doc_id", ($"rk0" + 1).as("rk"),
        $"t.id".as("term"), $"t.score".as("score"))
      .orderBy($"doc_id", $"rk")
  }
  private val q78Sql =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |idf AS (SELECT tok, ln(((SELECT n_docs FROM stats) - df + 0.5)
      |    / (df + 0.5) + 1.0) AS idf FROM df),
      |scored AS (SELECT tf.doc_id, tf.tok,
      |    round(idf.idf * (tf.tf * 2.2) /
      |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats))), 6) AS score
      |  FROM tf JOIN idf ON tf.tok = idf.tok JOIN dl ON tf.doc_id = dl.doc_id),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, tok) AS rk FROM scored)
      |SELECT doc_id, rk, tok AS term, score FROM rk WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  /** q79: chunk-level exact dedup — 8-token non-overlapping chunks hashed
    * by content; a chunk occurring more than once ANYWHERE in the corpus
    * is a duplicate (the paragraph-dedup semantics of web-corpus
    * pipelines, CCNet-style, at token-window granularity). Per document:
    * chunk count, duplicated-chunk count, duplication ratio. */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .withColumn("len", size($"toks"))
      .filter($"len" >= 1)
      .select($"doc_id", explode(expr("sequence(1, len, 8)")).as("start"), $"toks")
      .select($"doc_id", md5(array_join(slice($"toks", $"start", lit(8)), " ")).as("chunk_md5"))
    val freq = chunks.groupBy($"chunk_md5").agg(count(lit(1)).as("cnt"))
    chunks.join(freq.hint("shuffle_hash"), "chunk_md5")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"cnt" > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select($"doc_id", $"n_chunks", $"n_dup_chunks",
        round($"n_dup_chunks" / $"n_chunks".cast("double"), 6).as("dup_chunk_ratio"))
      .orderBy($"doc_id")
  }
  private val q79Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (SELECT doc_id, t, len(t) AS n, unnest(range(1, len(t) + 1, 8)) AS s
      |  FROM d WHERE len(t) >= 1),
      |kept AS (SELECT doc_id,
      |    md5(list_aggregate(t[s:least(s + 7, n)], 'string_agg', ' ')) AS chunk_md5
      |  FROM st),
      |freq AS (SELECT chunk_md5, count(*) AS cnt FROM kept GROUP BY 1)
      |SELECT k.doc_id, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |  round(sum(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE), 6) AS dup_chunk_ratio
      |FROM kept k JOIN freq f ON k.chunk_md5 = f.chunk_md5
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bit-interleave of two 8-bit values — identical expression text is
    * valid in Spark SQL (>= 4.0 bitwise shift operators) and DuckDB, so
    * both engines evaluate literally the same formula. */
  private val zExpr: String = (0 until 8)
    .map(i => s"((((px >> $i) & 1) << ${2 * i}) + (((ox >> $i) & 1) << ${2 * i + 1}))")
    .mkString(" + ")

  /** q80: Z-order layout audit — interleave the low 8 bits of
    * (l_partkey, l_orderkey) into a 16-bit Z-value, bucket rows into 32
    * Z-ranges (a pure projection — `zval div 2048` — NOT a global-sort
    * ntile), and report each bucket's row count and per-dimension min/max.
    * The tight per-bucket rectangles are the min/max footer stats a
    * Z-ordered writer earns, i.e. why both WHERE px BETWEEN ... and WHERE
    * ox BETWEEN ... prune most buckets. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select(($"l_partkey" % 256).as("px"), ($"l_orderkey" % 256).as("ox"))
      .withColumn("zval", expr(zExpr))
      .select(expr("zval div 2048").as("zbucket"), $"px", $"ox")
      .groupBy($"zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"px").as("min_px"), max($"px").as("max_px"),
        min($"ox").as("min_ox"), max($"ox").as("max_ox"))
      .orderBy($"zbucket")
  }
  private val q80Sql =
    s"""WITH b AS (SELECT l_partkey % 256 AS px, l_orderkey % 256 AS ox FROM lineitem),
       |z AS (SELECT px, ox, $zExpr AS zval FROM b)
       |SELECT zval // 2048 AS zbucket, count(*) AS n_rows,
       |  min(px) AS min_px, max(px) AS max_px,
       |  min(ox) AS min_ox, max(ox) AS max_ox
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  /** One Hilbert round (top-down, quadrant size s) as pure-arithmetic
    * expression strings over columns (x, y, d) — the canonical
    * Lam–Shapiro iteration with the bit tests rewritten as div/mod so
    * ONE generated kernel serves both engines (only the integer-division
    * keyword differs): rx = (x div s) % 2, ry likewise,
    * d += s²·((3rx) xor ry) with the 2-bit xor expanded to a CASE, then
    * the reflect-and-swap rotation. Returns (d', x', y'). */
  private def hilbertRound(divOp: String, s: Int): (String, String, String) = {
    val rx = s"(x $divOp $s) % 2"
    val ry = s"(y $divOp $s) % 2"
    (s"d + ${s * s} * (CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END)",
      s"CASE WHEN $ry = 1 THEN x WHEN $rx = 1 THEN 255 - y ELSE y END",
      s"CASE WHEN $ry = 1 THEN y WHEN $rx = 1 THEN 255 - x ELSE x END")
  }
  private val hilbertS = Seq(128, 64, 32, 16, 8, 4, 2, 1)

  /** q279: Hilbert-curve clustering keys — the space-filling-curve
    * layout with strictly better locality than q80's Z-order (Hilbert
    * buckets are edge-connected: no Z-shaped jumps, so a 2-D range scan
    * touches fewer buckets — the reason Delta/Iceberg grew hilbert
    * alongside zorder). Same (l_partkey, l_orderkey % 256) plane and the
    * same bucket → min/max skipping-index output as q80, so the two
    * gates are directly comparable; the curve index is 8 unrolled
    * rounds of the shared [[hilbertRound]] kernel — integer div/mod/CASE
    * only, bit-identical across engines, a pure projection (zero
    * shuffle) exactly like the z-interleave it generalizes. */
  private def q279(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var df = Tables.lineitem(s, dir)
      .select(($"l_partkey" % 256).as("px"), ($"l_orderkey" % 256).as("ox"))
      .selectExpr("px", "ox", "px AS x", "ox AS y", "CAST(0 AS BIGINT) AS d")
    hilbertS.foreach { sz =>
      val (de, xe, ye) = hilbertRound("div", sz)
      df = df.selectExpr("px", "ox", s"$xe AS x", s"$ye AS y", s"$de AS d")
    }
    df.select(expr("d div 1024").as("hbucket"), $"px", $"ox")
      .groupBy($"hbucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"px").as("min_px"), max($"px").as("max_px"),
        min($"ox").as("min_ox"), max($"ox").as("max_ox"))
      .orderBy($"hbucket")
  }
  private val q279Sql = {
    val rounds = hilbertS.zipWithIndex.map { case (sz, i) =>
      val (de, xe, ye) = hilbertRound("//", sz)
      s"h${i + 1} AS (SELECT px, ox, $xe AS x, $ye AS y, $de AS d FROM h$i)"
    }.mkString(",\n")
    s"""WITH h0 AS (SELECT l_partkey % 256 AS px, l_orderkey % 256 AS ox,
       |    l_partkey % 256 AS x, l_orderkey % 256 AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM lineitem),
       |$rounds
       |SELECT d // 1024 AS hbucket, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(px) AS min_px, max(px) AS max_px,
       |  min(ox) AS min_ox, max(ox) AS max_ox
       |FROM h${hilbertS.length} GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q81: two-level HLL sketch merge — per-source Datasketches HLL over
    * the token stream (lgK = 12, ~1.6% rsd), then the BINARY sketches
    * union-merged into a corpus-wide estimate. Output carries the exact
    * distinct counts plus a within-5% claim per row; the oracle recomputes
    * the exact side and asserts the claim TRUE, so an estimator drifting
    * out of band hash-fails (one-sided oracle, q42/q66 pattern). */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
    val per = toks.groupBy($"source")
      .agg(hll_sketch_agg($"tok", lit(12)).as("sk"),
        countDistinct($"tok").as("exact_distinct"))
    val perRow = per.select($"source", $"exact_distinct",
      (abs(hll_sketch_estimate($"sk") - $"exact_distinct") <=
        lit(0.05) * $"exact_distinct").as("within_5pct"))
    // 1-row x 1-row attach via data-derived constant equi-key (a literal
    // cross join would plan as BNLJ — the q61/q78 broadcast-key pattern)
    val total = per
      .agg(hll_union_agg($"sk").as("sk"), sum($"exact_distinct").as("s0"))
      .withColumn("one", pmod($"s0", lit(1L)))
      .join(broadcast(toks.agg(countDistinct($"tok").as("exact_distinct"))
        .withColumn("one", pmod($"exact_distinct", lit(1L)))), "one")
      .select(lit("TOTAL").as("source"), $"exact_distinct",
        (abs(hll_sketch_estimate($"sk") - $"exact_distinct") <=
          lit(0.05) * $"exact_distinct").as("within_5pct"))
    perRow.union(total).orderBy($"source")
  }
  private val q81Sql =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |per AS (SELECT source, count(DISTINCT tok) AS exact_distinct
      |  FROM toks GROUP BY 1),
      |total AS (SELECT 'TOTAL' AS source, count(DISTINCT tok) AS exact_distinct
      |  FROM toks)
      |SELECT source, exact_distinct, TRUE AS within_5pct FROM per
      |UNION ALL SELECT source, exact_distinct, TRUE AS within_5pct FROM total
      |ORDER BY source""".stripMargin

  /** q273: query-likelihood retrieval with Dirichlet smoothing (μ=2000) —
    * the third classic lexical scorer next to TF-IDF (q61) and BM25
    * (q78): score(d) = Σ_t ln((tf_td + μ·cf_t/|C|) / (dl_d + μ)) for the
    * fixed query {hash, join, vector}. EVERY document scores (absent
    * terms still contribute smoothed background mass — the property that
    * distinguishes QL from the tf-only scorers), so the plan is one
    * doc-length aggregate over all tokens plus one CONDITIONAL aggregate
    * over the term-filtered stream (the filter reaches the token stream;
    * the full vocabulary never shuffles), corpus stats ride the q78
    * one-row broadcast. The three log terms are summed in fixed textual
    * order and rounded at 6 dp before ranking (q78's ulp discipline);
    * top-10 plans as TakeOrderedAndProject. */
  private def q273(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mu = 2000.0
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = toks.agg(count(lit(1)).cast("double").as("clen"),
        sum(when($"tok" === "hash", 1L).otherwise(0L)).cast("double").as("cf1"),
        sum(when($"tok" === "join", 1L).otherwise(0L)).cast("double").as("cf2"),
        sum(when($"tok" === "vector", 1L).otherwise(0L)).cast("double").as("cf3"))
      .withColumn("one", pmod($"clen".cast("long"), lit(1L)))
    val tf = toks.filter($"tok".isin("hash", "join", "vector"))
      .groupBy($"doc_id")
      .agg(sum(when($"tok" === "hash", 1L).otherwise(0L)).as("tf1"),
        sum(when($"tok" === "join", 1L).otherwise(0L)).as("tf2"),
        sum(when($"tok" === "vector", 1L).otherwise(0L)).as("tf3"))
    dl.join(tf, Seq("doc_id"), "left")
      .na.fill(0L, Seq("tf1", "tf2", "tf3"))
      .withColumn("one", pmod($"dl", lit(1L)))
      .join(broadcast(stats), "one")
      .select($"doc_id", round(
        log(($"tf1" + lit(mu) * $"cf1" / $"clen") / ($"dl" + lit(mu))) +
          log(($"tf2" + lit(mu) * $"cf2" / $"clen") / ($"dl" + lit(mu))) +
          log(($"tf3" + lit(mu) * $"cf3" / $"clen") / ($"dl" + lit(mu))), 6)
        .as("score"))
      .orderBy($"score".desc, $"doc_id").limit(10)
  }
  private val q273Sql =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS clen,
      |    CAST(sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS DOUBLE) AS cf1,
      |    CAST(sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS DOUBLE) AS cf2,
      |    CAST(sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS DOUBLE) AS cf3
      |  FROM toks),
      |tf AS (SELECT doc_id,
      |    CAST(sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
      |    CAST(sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS tf2,
      |    CAST(sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf3
      |  FROM toks WHERE tok IN ('hash', 'join', 'vector') GROUP BY 1)
      |SELECT dl.doc_id, round(
      |    ln((coalesce(tf1, 0) + 2000.0 * cf1 / clen) / (dl + 2000.0)) +
      |    ln((coalesce(tf2, 0) + 2000.0 * cf2 / clen) / (dl + 2000.0)) +
      |    ln((coalesce(tf3, 0) + 2000.0 * cf3 / clen) / (dl + 2000.0)), 6)
      |    AS score
      |FROM dl LEFT JOIN tf USING (doc_id) CROSS JOIN st
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** q274: compaction planning — the table-maintenance pass that turns a
    * skewed pile of daily segments into uniform output files (the
    * OPTIMIZE/rewrite step every lakehouse table needs): per month,
    * segments (here: order-day row groups) sort by size DESC then day
    * (first-fit-decreasing order), and each is assigned the output file
    * floor(exclusive-cumulative-rows / 5000) — the sorted next-fit policy
    * whose assignment is a pure prefix sum, so the plan itself is one
    * calendar-grain aggregate + one per-month window (bounded partitions;
    * at fleet scale the same window keys by table partition). Output
    * files then roll up to (n_segments, total_rows) — the write manifest
    * a compactor would execute, fully deterministic. */
  private def q274(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val segs = Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_orderdate".as("day"))
      .agg(count(lit(1)).as("rows"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"month").orderBy($"rows".desc, $"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    segs.withColumn("cum", coalesce(sum($"rows").over(w), lit(0L)))
      .withColumn("out_file", expr("cum div 5000"))
      .groupBy($"month", $"out_file")
      .agg(count(lit(1)).as("n_segments"), sum($"rows").as("total_rows"))
      .orderBy($"month", $"out_file")
  }
  private val q274Sql =
    """WITH segs AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    o_orderdate AS day, CAST(count(*) AS BIGINT) AS rows
      |  FROM orders GROUP BY 1, 2),
      |asg AS (SELECT month, rows,
      |    coalesce(sum(rows) OVER (PARTITION BY month
      |      ORDER BY rows DESC, day ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) // 5000 AS out_file
      |  FROM segs)
      |SELECT month, CAST(out_file AS BIGINT) AS out_file,
      |  CAST(count(*) AS BIGINT) AS n_segments,
      |  CAST(sum(rows) AS BIGINT) AS total_rows
      |FROM asg GROUP BY 1, 2 ORDER BY month, out_file""".stripMargin

  /** q271: KMV (k-minimum-values) distinct sketch — the third mergeable
    * cardinality sketch next to HLL (q81) and CMS (q88), and the one
    * whose estimate is an EXACT function of the data given a fixed hash,
    * so unlike q81's within-band claim the oracle replays the estimator
    * itself: per event type, hash every distinct user through the
    * two-step odd-multiplier LCG (a bijection on [0, 2³¹) — both steps
    * multiply by odd constants mod 2³¹, so distinct users map to
    * distinct hashes and the k-th minimum is well defined), keep the
    * k = 64 smallest via the bounded map-side [[org.apache.spark.sql.graft.TopKAggregate]]
    * buffer (the shuffle carries 64 rows per type, never the user list —
    * the same collapse q29 rides), and estimate |D| ≈ (k−1)·2³¹ / h₍ₖ₎
    * in integer arithmetic. Types with fewer than k distinct users are
    * excluded by both engines (the sketch is exact there anyway).
    * err_pct multiplies the integer error by 100.0 before the one
    * double division, so both engines round once, identically. */
  private def q271(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val du = Tables.events(s, dir)
      .select($"event_type", $"user_id").distinct()
      .withColumn("h", (lit(1103515245L) *
        ((lit(2654435761L) * ($"user_id" % 2147483648L)) % 2147483648L)
        + 12345L) % 2147483648L)
    du.groupBy($"event_type")
      .agg(count(lit(1)).as("n_exact"),
        graft.functions.aggregates
          .topKByScore(-$"h".cast("double"), $"h", 64).as("mins"))
      .filter(size($"mins") >= 64)
      .withColumn("hk", element_at($"mins", 64).getField("id"))
      .select($"event_type", $"n_exact",
        expr("(63 * 2147483648) div hk").as("kmv_est"))
      .withColumn("err_pct",
        round(abs($"kmv_est" - $"n_exact") * 100.0 / $"n_exact", 2))
      .orderBy($"event_type")
  }
  private val q271Sql =
    """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
      |h AS (SELECT event_type,
      |    (1103515245 * ((2654435761 * (user_id % 2147483648)) % 2147483648)
      |      + 12345) % 2147483648 AS h
      |  FROM du),
      |r AS (SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |  FROM h),
      |kth AS (SELECT event_type, h AS hk FROM r WHERE rk = 64),
      |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
      |  FROM du GROUP BY 1)
      |SELECT ex.event_type, ex.n_exact,
      |  CAST((63 * 2147483648) // hk AS BIGINT) AS kmv_est,
      |  round(abs((63 * 2147483648) // hk - n_exact) * 100.0 / n_exact, 2)
      |    AS err_pct
      |FROM ex JOIN kth USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** q88: Count-Min heavy hitters — the top-20 tokens by exact count, each
    * probed against a corpus-wide CMS (Spark's `count_min_sketch`
    * aggregate, queried through the graft `CmsEstimate` expression via a
    * scalar subquery). The output claims the CMS contract per hitter:
    * estimate >= exact (CMS never undercounts) and estimate <= exact +
    * ceil(eps·N). The oracle recomputes exact counts and asserts both
    * claims TRUE — a sketch drifting out of band hash-fails (one-sided
    * pattern). Sketch state is constant-size and mergeable: the 100 TB
    * form is per-partition sketches combined map-side, same as q81's HLL. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("tok"))
    val cnt = toks.groupBy($"tok").agg(count(lit(1)).as("exact_count"))
    val top = cnt.orderBy($"exact_count".desc, $"tok").limit(20)
    // sketch + corpus size in ONE broadcast row, attached via the
    // data-derived constant-key pattern (a literal key would constant-fold
    // into a nested-loop join)
    val cmsDf = toks.agg(
        expr("count_min_sketch(tok, 0.0001d, 0.99d, 42)").as("cms"),
        count(lit(1)).as("n_toks"))
      .withColumn("one", pmod($"n_toks", lit(1L)))
    top
      .withColumn("one", pmod($"exact_count", lit(1L)))
      .join(broadcast(cmsDf), "one")
      .withColumn("est", graft.functions.sketches.cmsEstimate($"cms", $"tok"))
      .select($"tok", $"exact_count",
        ($"est" >= $"exact_count").as("claim_lower"),
        ($"est" <= $"exact_count" + ceil($"n_toks" * lit(0.0001))).as("claim_within"))
      .orderBy($"exact_count".desc, $"tok")
  }
  private val q88Sql =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS exact_count FROM toks GROUP BY 1)
      |SELECT tok, exact_count, TRUE AS claim_lower, TRUE AS claim_within
      |FROM c ORDER BY exact_count DESC, tok LIMIT 20""".stripMargin

  /** q97: range scan through the min/max data-skipping index
    * ([[graft.layout.DataSkipping]]) — per-file stats are collected, the
    * file list is pruned to ranges overlapping a 6-month shipdate window,
    * and only surviving files are scanned (with the exact predicate
    * re-applied). The oracle filters the full table directly, so the gate
    * proves pruning NEVER changes results; the ZOrderCompactSpec proves it
    * actually skips files on a clustered multi-file table. */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = graft.layout.DataSkipping.fileStats(
      s, s"$dir/lineitem.parquet", Seq("l_shipdate"))
    val lo = lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("2001-06-30 00:00:00"))
    graft.layout.DataSkipping.readPruned(s, stats, "l_shipdate", lo, hi)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"), 2)
          .as("revenue"))
      .orderBy($"l_returnflag")
  }
  private val q97Sql =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '2001-01-01 00:00:00'
      |  AND TIMESTAMP '2001-06-30 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q241: inverted-index postings-size estimate — per term, the varint
    * byte cost of delta-encoding its sorted posting list (the layout
    * arithmetic an index builder runs to budget shards and pick
    * compression): gap = doc_id − previous (first entry vs −1 so every
    * gap ≥ 1), varint bytes = ceil(bits(gap)/7) with bits = binary-string
    * length — pure integer arithmetic on both engines, so the byte totals
    * hash exactly. One windowed pass per term partition + one grouped
    * sum; df ≥ 5 keeps the diagnostic at head-term grain. */
  private def q241(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"term").orderBy($"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", explode(array_distinct(
        expr("filter(split(text, ' '), t -> length(t) >= 4)"))).as("term"))
      .withColumn("gap",
        $"doc_id" - coalesce(lag($"doc_id", 1).over(w), lit(-1L)))
      .withColumn("vbytes", expr("(length(bin(gap)) + 6) div 7"))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"vbytes").as("varint_bytes"),
        max($"gap").as("max_gap"))
      .filter($"df" >= 5)
      .orderBy($"term")
  }
  private val q241Sql =
    """WITH t AS (SELECT DISTINCT doc_id, unnest(list_filter(
      |    string_split(text, ' '), tk -> len(tk) >= 4)) AS term
      |  FROM documents),
      |g AS (SELECT term, doc_id, doc_id - coalesce(
      |    lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), -1) AS gap
      |  FROM t),
      |v AS (SELECT term, gap, (length(bin(gap)) + 6) // 7 AS vbytes FROM g)
      |SELECT term, CAST(count(*) AS BIGINT) AS df,
      |  CAST(sum(vbytes) AS BIGINT) AS varint_bytes,
      |  CAST(max(gap) AS BIGINT) AS max_gap
      |FROM v GROUP BY term HAVING count(*) >= 5 ORDER BY term""".stripMargin

  /** q258: rendezvous (highest-random-weight) shard assignment and the
    * 8→9-node rebalance matrix — the consistent-placement primitive under
    * shard topologies (§ q150's manifest assumes a FIXED shard count;
    * this is what changing the count costs): each doc goes to the node
    * maximizing md5(doc_id ‖ node), so growing the ring moves ONLY the
    * docs whose new node wins (≈1/9 of them) and the off-diagonal of the
    * output matrix IS the migration plan. Weights are the first 8 md5 hex
    * digits as integers (engine-identical — the q60/q180 md5-bucket
    * contract), argmax is a per-doc window with (weight DESC, node ASC)
    * tie-break; the 8/9-row node dims broadcast, so cost is two
    * window passes over n·k rows, no data-sized shuffle beyond doc_id. */
  private def q258(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def shard(nNodes: Int, as: String): DataFrame = {
      val nodes = (0 until nNodes).map(_.toLong).toDF("node")
      val w = Window.partitionBy($"doc_id").orderBy($"hr".desc, $"node")
      Tables.documents(s, dir).select($"doc_id")
        .crossJoin(broadcast(nodes))
        .withColumn("hr", conv(substring(md5(
          concat($"doc_id".cast("string"), lit("_"),
            $"node".cast("string"))), 1, 8), 16, 10).cast("long"))
        .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"doc_id", $"node".as(as))
    }
    shard(8, "node_before").join(shard(9, "node_after"), "doc_id")
      .groupBy($"node_before", $"node_after")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"node_before", $"node_after")
  }
  private val q258Sql = {
    def hex8(expr: String): String =
      (1 to 8).map { i =>
        s"(strpos('0123456789abcdef', substr(md5($expr), $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
      }.mkString("(", " + ", ")")
    def shardCte(n: Int, name: String): String = {
      val hr = hex8(s"CAST(doc_id AS VARCHAR) || '_' || CAST(node AS VARCHAR)")
      s"""$name AS (SELECT doc_id, node FROM (
         |  SELECT d.doc_id, n.node, row_number() OVER (
         |    PARTITION BY d.doc_id ORDER BY $hr DESC, n.node) AS rk
         |  FROM documents d CROSS JOIN
         |    (SELECT CAST(unnest(range(0, $n)) AS BIGINT) AS node) n) t
         |  WHERE rk = 1)""".stripMargin
    }
    s"""WITH ${shardCte(8, "b")},
       |${shardCte(9, "a")}
       |SELECT b.node AS node_before, a.node AS node_after,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM b JOIN a USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** q328: KMV sketch SET OPERATIONS — the estimator family q271's
    * distinct sketch exists to enable: for every pair of corpus sources,
    * estimate the UNION size, JACCARD similarity, and INTERSECTION size
    * of their 3-gram shingle vocabularies from two k=128 KMV sketches
    * alone (Beyer et al., "On Synopses for Distinct-Value Estimation
    * Under Multiset Operations", SIGMOD'07) — the audience-overlap /
    * cross-shard-contamination readout that at fleet scale replaces a
    * quadratic all-pairs distinct join with O(sources²·k) work on
    * pre-aggregated synopses. Hash is the 48-bit md5 prefix (exact in
    * int64 on both engines); per-source sketches ride the bounded
    * [[org.apache.spark.sql.graft.TopKAggregate]] buffer (128 rows per
    * source cross the exchange, never the shingle stream — the q271
    * collapse). The combined-sketch math follows the paper: the k
    * smallest of the merged sketches are a valid KMV synopsis of the
    * union (the k-th combined value is ≤ both sketches' maxima whenever
    * both are full, and a partial sketch IS its complete set);
    * est_union = (k−1)·2⁴⁸ div h₍ₖ₎ in the full regime and the exact
    * merged count otherwise; ρ = |sketch∩| / m gives jaccard and
    * intersection at ppm scale, all integer. The exact_* columns are the
    * declared AUDIT baseline — the full pairwise distinct join the
    * sketch path replaces (quadratic in sources × vocabulary; dropped,
    * not shipped, at production scale), so the gate pins estimator AND
    * measured error in one artifact. */
  private def q328(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 128
    val m48 = 281474976710656L // 2^48 hash space
    val sh = Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .select($"source",
        explode(graft.functions.text.shingles($"toks", 3)).as("shingle"))
      .select($"source",
        conv(substring(md5($"shingle"), 1, 12), 16, 10).cast("long").as("h"))
      .distinct()
    // per-source k-minimum sketch: bounded partial-combinable aggregate,
    // then back to rows (pos is the within-sketch rank, h ascending)
    val sk = sh.groupBy($"source")
      .agg(graft.functions.aggregates
        .topKByScore(-$"h".cast("double"), $"h", k).as("mins"))
      .select($"source", posexplode($"mins"))
      .select($"source", $"col.id".as("h"))
    val sizes = sk.groupBy($"source").agg(count(lit(1)).as("sz"))
    val pairs = sizes.select($"source".as("sa")).join(
      sizes.select($"source".as("sb")), $"sa" < $"sb")
    // merged sketch per pair with membership bits; the two broadcast
    // equi-joins keep the pair fan-out off the data-sized path
    val uv = sk.join(broadcast(pairs), $"source" === $"sa")
        .select($"sa", $"sb", $"h", lit(1L).as("ina"), lit(0L).as("inb"))
      .unionAll(sk.join(broadcast(pairs), $"source" === $"sb")
        .select($"sa", $"sb", $"h", lit(0L).as("ina"), lit(1L).as("inb")))
      .groupBy($"sa", $"sb", $"h")
      .agg(max($"ina").as("ina"), max($"inb").as("inb"))
    val wp = Window.partitionBy($"sa", $"sb")
    val ur = uv
      .withColumn("rk", row_number().over(wp.orderBy($"h")))
      .withColumn("usz", count(lit(1)).over(wp))
    val est = ur.filter($"rk" <= k)
      .groupBy($"sa", $"sb", $"usz")
      .agg(count(lit(1)).as("m"), max($"h").as("kth"),
        sum($"ina" * $"inb").as("matches"))
      .select($"sa", $"sb", $"m", $"matches",
        when($"usz" < k, $"usz")
          .otherwise(expr(s"(${k - 1}L * ${m48}L) div kth"))
          .as("est_union"))
      .withColumn("jacc_ppm", expr("(matches * 1000000) div m"))
      .withColumn("est_inter", expr("(est_union * matches) div m"))
    // audit baseline: exact pairwise set ops over the FULL distinct sets
    val xv = sh.join(broadcast(pairs), $"source" === $"sa")
        .select($"sa", $"sb", $"h", lit(1L).as("ina"), lit(0L).as("inb"))
      .unionAll(sh.join(broadcast(pairs), $"source" === $"sb")
        .select($"sa", $"sb", $"h", lit(0L).as("ina"), lit(1L).as("inb")))
      .groupBy($"sa", $"sb", $"h")
      .agg(max($"ina").as("ina"), max($"inb").as("inb"))
      .groupBy($"sa", $"sb")
      .agg(count(lit(1)).as("exact_union"),
        sum($"ina" * $"inb").as("exact_inter"))
    est.join(xv, Seq("sa", "sb"))
      .withColumn("union_err_ppm",
        expr("((est_union - exact_union) * 1000000) div exact_union"))
      .select($"sa", $"sb", $"m", $"est_union", $"exact_union",
        $"union_err_ppm", $"matches", $"jacc_ppm", $"est_inter",
        $"exact_inter")
      .orderBy($"sa", $"sb")
  }
  private val q328Sql = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(shingle), $i, 1)) - 1)"
    val h48 = (1 to 12).map(i =>
      s"${digit(i)} * ${java.lang.Long.toString(1L << (4 * (12 - i)))}")
      .mkString("(", " + ", ")")
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t
      |  FROM documents),
      |shg AS (SELECT source, unnest(list_distinct(list_transform(
      |      range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])))
      |      AS shingle
      |    FROM toks WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT source, $h48 AS h FROM shg),
      |r AS (SELECT source, h, row_number() OVER (PARTITION BY source
      |    ORDER BY h) AS rk FROM sh),
      |sk AS (SELECT source, h FROM r WHERE rk <= 128),
      |src AS (SELECT DISTINCT source FROM sk),
      |pairs AS (SELECT a.source AS sa, b.source AS sb
      |  FROM src a JOIN src b ON a.source < b.source),
      |uv AS (SELECT p.sa, p.sb, s.h,
      |    max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
      |    max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
      |  FROM pairs p JOIN sk s ON s.source IN (p.sa, p.sb)
      |  GROUP BY 1, 2, 3),
      |ur AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h)
      |      AS rk,
      |    count(*) OVER (PARTITION BY sa, sb) AS usz FROM uv),
      |est AS (SELECT sa, sb, usz, CAST(count(*) AS BIGINT) AS m,
      |    max(h) AS kth, CAST(sum(ina * inb) AS BIGINT) AS matches
      |  FROM ur WHERE rk <= 128 GROUP BY 1, 2, 3),
      |e2 AS (SELECT sa, sb, m, matches,
      |    CAST(CASE WHEN usz < 128 THEN usz
      |      ELSE (127 * 281474976710656) // kth END AS BIGINT) AS est_union
      |  FROM est),
      |xv AS (SELECT p.sa, p.sb, s.h,
      |    max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
      |    max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
      |  FROM pairs p JOIN sh s ON s.source IN (p.sa, p.sb)
      |  GROUP BY 1, 2, 3),
      |ex AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS exact_union,
      |    CAST(sum(ina * inb) AS BIGINT) AS exact_inter
      |  FROM xv GROUP BY 1, 2)
      |SELECT e2.sa, e2.sb, e2.m, e2.est_union, ex.exact_union,
      |  CAST(((e2.est_union - ex.exact_union) * 1000000) // ex.exact_union
      |    AS BIGINT) AS union_err_ppm,
      |  e2.matches,
      |  CAST((e2.matches * 1000000) // e2.m AS BIGINT) AS jacc_ppm,
      |  CAST((e2.est_union * e2.matches) // e2.m AS BIGINT) AS est_inter,
      |  ex.exact_inter
      |FROM e2 JOIN ex USING (sa, sb)
      |ORDER BY sa, sb""".stripMargin
  }

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q258_rendezvous_rebalance", q258, Some(q258Sql)),
    QueryDef("q328_kmv_set_ops", q328, Some(q328Sql)),
    QueryDef("q78_bm25_topk", q78, Some(q78Sql)),
    QueryDef("q241_postings_size", q241, Some(q241Sql)),
    QueryDef("q97_minmax_skipping", q97, Some(q97Sql)),
    QueryDef("q79_chunk_dedup", q79, Some(q79Sql)),
    QueryDef("q80_zorder_layout", q80, Some(q80Sql)),
    QueryDef("q81_hll_sketch_merge", q81, Some(q81Sql)),
    QueryDef("q271_kmv_distinct", q271, Some(q271Sql)),
    QueryDef("q273_dirichlet_ql", q273, Some(q273Sql)),
    QueryDef("q274_compaction_plan", q274, Some(q274Sql)),
    QueryDef("q279_hilbert_layout", q279, Some(q279Sql)),
    QueryDef("q88_cms_heavy_hitters", q88, Some(q88Sql)),
    QueryDef("q109_phrase_search", q109, Some(q109Sql)),
    QueryDef("q212_proximity_search", q212, Some(q212Sql)),
    QueryDef("q310_multipattern_tag", q310, Some(q310Sql)),
    QueryDef("q324_redaction_plan", q324, Some(q324Sql)),
  )

  /** q324: REDACTION PLAN — the actionable other half of q310's tagging:
    * WHERE to cut, not just how much matched. The span-reporting
    * automaton ([[org.apache.spark.sql.graft.AhoCorasickSpans]], 1-based
    * inclusive offsets) emits every overlapping dictionary match in one
    * walk; overlapping spans then COALESCE into maximal disjoint
    * redaction intervals (a cut is one contiguous splice — redacting
    * "table value" and "value fast" separately would double-cut the
    * shared word) via gaps-and-islands per doc: a new island starts when
    * a span begins AFTER the running max end (strictly — touching spans
    * stay separate cuts). Each interval reports its bounds, length, and
    * how many matches/distinct patterns it absorbed.
    *
    * Scale shape: the walk is the same per-row projection as q310; the
    * merge is one per-doc window pair plus one grouped aggregate —
    * everything shuffles on doc_id, islands are match-count-bounded. */
  private def q324(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pats = Seq("table value", "a a", "fast table", "query key scan",
      "a a a", "merge batch", "table", "stream stream", "slow fast",
      "value fast")
    val w = Window.partitionBy($"doc_id").orderBy($"start", $"end", $"pid")
    Tables.documents(s, dir)
      .select($"doc_id",
        explode(graft.functions.multipattern
          .ahoCorasickSpans($"text", pats)).as("sp"))
      .select($"doc_id", $"sp.pid".as("pid"), $"sp.start".as("start"),
        $"sp.end".as("end"))
      .withColumn("prev_max", max($"end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island", sum(
        when($"prev_max".isNull || $"start" > $"prev_max", 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"island")
      .agg(min($"start").cast("long").as("red_start"),
        max($"end").cast("long").as("red_end"),
        count(lit(1)).as("n_matches"),
        countDistinct($"pid").as("n_patterns"))
      .select($"doc_id", $"island".as("span_no"), $"red_start", $"red_end",
        ($"red_end" - $"red_start" + 1L).as("red_len"),
        $"n_matches", $"n_patterns")
      .orderBy($"doc_id", $"span_no")
  }
  private val q324Sql = {
    val pats = Seq("table value", "a a", "fast table", "query key scan",
      "a a a", "merge batch", "table", "stream stream", "slow fast",
      "value fast")
    val values = pats.zipWithIndex
      .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $values) t(pid, pattern)),
       |m AS (SELECT d.doc_id, p.pid, CAST(pos.i AS INTEGER) AS s_,
       |    CAST(pos.i + length(p.pattern) - 1 AS INTEGER) AS e_
       |  FROM documents d, pats p,
       |    LATERAL (SELECT unnest(generate_series(1,
       |      greatest(length(d.text) - length(p.pattern) + 1, 0))) AS i) pos
       |  WHERE substr(d.text, CAST(pos.i AS INTEGER), length(p.pattern))
       |      = p.pattern),
       |w AS (SELECT doc_id, pid, s_, e_,
       |    max(e_) OVER (PARTITION BY doc_id ORDER BY s_, e_, pid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM m),
       |i AS (SELECT *, sum(CASE WHEN prev_max IS NULL OR s_ > prev_max
       |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
       |      ORDER BY s_, e_, pid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM w)
       |SELECT doc_id, CAST(island AS BIGINT) AS span_no,
       |  CAST(min(s_) AS BIGINT) AS red_start,
       |  CAST(max(e_) AS BIGINT) AS red_end,
       |  CAST(max(e_) - min(s_) + 1 AS BIGINT) AS red_len,
       |  CAST(count(*) AS BIGINT) AS n_matches,
       |  CAST(count(DISTINCT pid) AS BIGINT) AS n_patterns
       |FROM i GROUP BY 1, 2 ORDER BY doc_id, span_no""".stripMargin
  }

  /** q310: MULTI-PATTERN corpus tagging with a native Aho–Corasick
    * automaton ([[org.apache.spark.sql.graft.AhoCorasickCounts]]) — the
    * PII-tag / keyword-dictionary / blocklist pass every curation
    * pipeline runs, where q109's single-phrase postings shape would need
    * one scan PER pattern: the automaton counts every (overlapping)
    * occurrence of all patterns in one O(|text|+matches) walk per row,
    * built once at plan time and shared across rows (the expression node
    * ships only the pattern strings). The dictionary deliberately
    * includes nested patterns ("a a" inside "a a a", "table" inside
    * "table value") and self-overlapping ones ("a a" twice inside
    * "a a a") — the fail/output-link semantics the oracle's brute-force
    * every-start-position replay pins exactly.
    *
    * Scale shape: a pure per-row projection over the already-pruned
    * (doc_id, text) columns — no shuffle until the tiny (doc, pattern,
    * n>0) result aggregates; at 100 TB this chains with the other
    * per-row curation passes in one scan. */
  private def q310(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pats = Seq("table value", "a a", "fast table", "query key scan",
      "a a a", "merge batch", "table", "stream stream", "slow fast",
      "value fast")
    val patDf = broadcast(pats.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "pattern"))
    Tables.documents(s, dir)
      .select($"doc_id",
        graft.functions.multipattern
          .ahoCorasickCounts($"text", pats).as("counts"))
      .select($"doc_id", posexplode($"counts").as(Seq("pid", "n")))
      .filter($"n" > 0L)
      .withColumn("pid", $"pid".cast("long"))
      .join(patDf, Seq("pid"))
      .select($"doc_id", $"pid", $"pattern", $"n")
      .orderBy($"doc_id", $"pid")
  }
  private val q310Sql = {
    val pats = Seq("table value", "a a", "fast table", "query key scan",
      "a a a", "merge batch", "table", "stream stream", "slow fast",
      "value fast")
    val values = pats.zipWithIndex
      .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $values) t(pid, pattern)),
       |hits AS (SELECT d.doc_id, p.pid, p.pattern,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM documents d, pats p,
       |    LATERAL (SELECT unnest(generate_series(1,
       |      greatest(length(d.text) - length(p.pattern) + 1, 0))) AS i) pos
       |  WHERE substr(d.text, CAST(pos.i AS INTEGER), length(p.pattern))
       |      = p.pattern
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, CAST(pid AS BIGINT) AS pid, pattern, n
       |FROM hits ORDER BY doc_id, pid""".stripMargin
  }

  /** q212: conjunctive proximity retrieval — documents containing ALL of
    * three query terms, ranked by how tightly the first two co-occur:
    * per-doc term frequencies plus the minimum positional gap between any
    * "spark" and any "join" occurrence. This is the AND-of-postings +
    * proximity-boost shape every keyword engine serves: each term's
    * postings filter out of the token stream BEFORE any shuffle, tfs
    * aggregate per (doc, term), the conjunction is an inner join of the
    * (small) per-term doc lists, and the min-gap join fans out tf_a·tf_b
    * rows per doc — bounded by per-doc term frequency, never by corpus
    * size. A naive engine rescans every document per query; this touches
    * only postings. Oracle recomputes by per-doc list arithmetic. */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
    def postings(t: String) = toks.filter($"tok" === t).select($"doc_id", $"pos")
    val ta = postings("spark"); val tb = postings("join"); val tc = postings("window")
    val tfs = ta.groupBy($"doc_id").agg(count(lit(1)).as("tf_spark"))
      .join(tb.groupBy($"doc_id").agg(count(lit(1)).as("tf_join")), Seq("doc_id"))
      .join(tc.groupBy($"doc_id").agg(count(lit(1)).as("tf_window")), Seq("doc_id"))
    val gap = ta.join(tb.select($"doc_id", $"pos".as("pos_b")), Seq("doc_id"))
      .groupBy($"doc_id").agg(min(abs($"pos" - $"pos_b")).as("min_gap"))
    tfs.join(gap, Seq("doc_id"))
      .select($"doc_id", $"tf_spark", $"tf_join", $"tf_window",
        $"min_gap".cast("long").as("min_gap"))
      .orderBy($"min_gap", $"doc_id")
  }
  private val q212Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT doc_id,
      |    list_filter(range(1, len(w) + 1), i -> w[i] = 'spark') AS pa,
      |    list_filter(range(1, len(w) + 1), i -> w[i] = 'join') AS pb,
      |    list_filter(range(1, len(w) + 1), i -> w[i] = 'window') AS pc
      |  FROM t),
      |h AS (SELECT doc_id,
      |    CAST(len(pa) AS BIGINT) AS tf_spark,
      |    CAST(len(pb) AS BIGINT) AS tf_join,
      |    CAST(len(pc) AS BIGINT) AS tf_window,
      |    CAST(list_min(flatten(list_transform(pa,
      |      a -> list_transform(pb, b -> abs(a - b))))) AS BIGINT) AS min_gap
      |  FROM m WHERE len(pa) > 0 AND len(pb) > 0 AND len(pc) > 0)
      |SELECT doc_id, tf_spark, tf_join, tf_window, min_gap
      |FROM h ORDER BY min_gap, doc_id""".stripMargin

  /** q109: positional phrase search — exact-phrase retrieval ("table
    * hash") through a positional inverted index: tokens posexplode once,
    * the TWO phrase terms' postings filter out BEFORE any shuffle (the
    * selectivity is the point — only matching-term rows move), and
    * adjacency is an equi-join on (doc_id, pos+1). That join-on-position
    * shape extends to any phrase length as a chain of postings joins —
    * the standard serving structure — where a naive `text LIKE` scan
    * reads every byte of every document. The oracle computes the same
    * adjacency count by list arithmetic. */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
    val a = toks.filter($"tok" === "table").select($"doc_id", $"pos")
    val b = toks.filter($"tok" === "hash")
      .select($"doc_id".as("doc_b"), $"pos".as("pos_b"))
    a.join(b, $"doc_id" === $"doc_b" && $"pos_b" === $"pos" + 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy($"doc_id")
  }
  private val q109Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |h AS (SELECT doc_id, len(list_filter(range(1, len(w)),
      |    i -> w[i] = 'table' AND w[i + 1] = 'hash')) AS n_hits FROM t)
      |SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM h
      |WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
}
