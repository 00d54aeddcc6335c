package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pre-training data-prep operators a production LLM pipeline runs after
  * dedup/curation and before batching: repetition filtering (Gopher-style
  * quality signal), embedding quantization (index memory budget), and
  * token-budget sequence packing (batch construction).
  *
  * Scale notes (100 TB posture):
  *   - q71 and q72 are pure per-row projections — no shuffle at all; the
  *     only cost is the scan and codegen'd expression work.
  *   - q73's packing is one window cumsum per language partition (a single
  *     shuffle on `lang`) plus integer arithmetic; at 100 TB the partition
  *     key would widen to (lang, shard-date) so no single language's
  *     running sum serializes through one task, which changes bin numbers
  *     only across shard boundaries — acceptable for batch construction.
  */
object TrainingPrepQueries extends QueryModule {

  /** q71: within-document repetition — the fraction of duplicate word
    * bigrams (and duplicate words) per document. High duplicate-n-gram
    * fraction is the classic repetition signal used to drop degenerate
    * generations / boilerplate from pre-training corpora. Distinct bigram
    * counting is the native WordShingles expression (one linear pass). */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
      .select($"doc_id", size($"toks").as("n_tokens"),
        (size($"toks") - 1).as("n_bigrams"),
        size(graft.functions.text.shingles($"toks", 2)).as("n_distinct_bigrams"),
        size(array_distinct($"toks")).as("n_distinct_words"))
      .withColumn("dup_bigram_ratio",
        round(lit(1.0) - $"n_distinct_bigrams" / $"n_bigrams".cast("double"), 6))
      .withColumn("dup_word_ratio",
        round(lit(1.0) - $"n_distinct_words" / $"n_tokens".cast("double"), 6))
      .orderBy($"doc_id")
  }
  private val q71Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |b AS (SELECT doc_id, len(w) AS n_tokens, len(w) - 1 AS n_bigrams,
      |    len(list_distinct(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i + 1]))) AS n_distinct_bigrams,
      |    len(list_distinct(w)) AS n_distinct_words
      |  FROM t WHERE len(w) >= 2)
      |SELECT doc_id, n_tokens, n_bigrams, n_distinct_bigrams, n_distinct_words,
      |  round(1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_ratio,
      |  round(1.0 - n_distinct_words / CAST(n_tokens AS DOUBLE), 6) AS dup_word_ratio
      |FROM b ORDER BY doc_id""".stripMargin

  /** q72: int8 symmetric quantization of the embedding table and the
    * reconstruction quality that decides whether an ANN index can run
    * quantized (4x memory cut, ~4x more vectors per node). Per vector:
    * scale = maxabs/127, q = floor(x/scale + 0.5) — the floor form instead
    * of round() because Spark and DuckDB agree bit-for-bit on floor while
    * their round() tie policies differ — reconstruct, then cosine(original,
    * reconstruction) and max absolute error. Per-label means go through
    * DECIMAL sums of the 6-dp-rounded cosines so the group aggregate is
    * order-independent (the q59 centroid pattern). */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("maxabs",
        expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .filter($"maxabs" > 0)
      .withColumn("scale", $"maxabs" / lit(127.0))
      .withColumn("rv", expr(
        "transform(v, x -> floor(x / scale + 0.5D) * scale)"))
      .withColumn("recon_cos", round(
        vector.dot($"v", $"rv") / (vector.norm($"v") * vector.norm($"rv")), 6))
      .withColumn("max_abs_err", round(expr(
        "aggregate(zip_with(v, rv, (x, y) -> abs(x - y)), CAST(0 AS DOUBLE), (a, x) -> greatest(a, x))"), 6))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        round((sum($"recon_cos".cast("decimal(10,6)")).cast("double") /
          count(lit(1))), 6).as("avg_recon_cos"),
        round(max($"max_abs_err"), 6).as("worst_abs_err"))
      .orderBy($"label")
  }
  private val q72Sql =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (SELECT vec_id, label, v,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS maxabs
      |  FROM e),
      |sc AS (SELECT vec_id, label, v, maxabs / 127.0 AS scale
      |  FROM m WHERE maxabs > 0),
      |rv AS (SELECT vec_id, label, v,
      |    list_transform(v, x -> floor(x / scale + 0.5) * scale) AS rv
      |  FROM sc),
      |q AS (SELECT label,
      |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(range(1, 65), i -> v[i] * rv[i])), (x, y) -> x + y)
      |      / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |          list_transform(v, x -> x * x)), (a, b) -> a + b))
      |       * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |          list_transform(rv, x -> x * x)), (a, b) -> a + b))), 6) AS recon_cos,
      |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, 65), i -> abs(v[i] - rv[i]))),
      |      (a, b) -> greatest(a, b)), 6) AS max_abs_err
      |  FROM rv)
      |SELECT label, count(*) AS n_vecs,
      |  round(CAST(sum(CAST(recon_cos AS DECIMAL(10,6))) AS DOUBLE) / count(*), 6)
      |    AS avg_recon_cos,
      |  round(max(max_abs_err), 6) AS worst_abs_err
      |FROM q GROUP BY label ORDER BY label""".stripMargin

  /** q73: token-budget sequence packing (concatenate-and-chunk): documents
    * are laid out per language in doc_id order, and each document is
    * assigned to the 2048-token training bin its starting offset falls in.
    * One window cumsum — the entire packing plan for a corpus shard is a
    * single shuffle, no driver involvement, and bin ids are a pure
    * function of the ordered token counts (reproducible batch layout). */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 2048
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .withColumn("n_tok", size(split($"text", " ")))
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("bin", floor(($"cum" - $"n_tok").cast("double") / budget).cast("long"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("bin_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"bin")
  }
  private val q73Sql =
    """WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |c AS (SELECT doc_id, lang, n_tok,
      |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t),
      |b AS (SELECT lang, doc_id, n_tok,
      |    CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS bin FROM c)
      |SELECT lang, bin, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  /** q105: pointwise-mutual-information token co-occurrence — the classic
    * collocation / phrase-mining statistic over document-level
    * co-occurrence. Tokens are deduped per document and vocabulary-bounded
    * (length >= 5, the frequency-cutoff stand-in every production PMI run
    * applies), pairs come from a doc_id-keyed self-join whose fan-out is
    * quadratic only in the BOUNDED per-doc vocab, and marginal doc
    * frequencies attach by two broadcast joins (the vocab table is orders
    * of magnitude smaller than the pair stream). The PMI *ratio*
    * n_ab·N/(n_a·n_b) is emitted instead of its log: one IEEE double
    * division of exact integers, bit-identical across engines, where a
    * log's ulp could flip the 6-dp round. The corpus size N rides on the
    * marginal table via the q98 data-derived-constant-key broadcast (a
    * literal key would constant-fold into a BNLJ). */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // co-occurring pairs come from a SORTED per-doc token array expanded
    // with higher-order functions — a pure projection, so the only
    // shuffles left are the two aggregates. The former toks⋈toks self-join
    // on doc_id shuffled the whole token stream twice to rebuild groups
    // the source row already had (same fan-out, one less wide stage).
    val docToks = Tables.documents(s, dir)
      .select($"doc_id", expr(
        "array_sort(array_distinct(filter(split(text, ' '), t -> length(t) >= 5)))")
        .as("toks"))
    val toks = docToks.select($"doc_id", explode($"toks").as("tok"))
    val nDocs = Tables.documents(s, dir)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("one", pmod($"n_docs", lit(1L)))
    val margin = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
      .withColumn("one", pmod($"df", lit(1L)))
      .join(broadcast(nDocs), "one").drop("one")
    val pairs = docToks
      .select(explode(expr(
        "flatten(transform(toks, (x, i) -> transform(" +
          "slice(toks, i + 2, size(toks)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy($"p.a".as("tok_a"), $"p.b".as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 5)
    pairs
      .join(broadcast(margin.select($"tok".as("tok_a"), $"df".as("df_a"), $"n_docs")), "tok_a")
      .join(broadcast(margin.select($"tok".as("tok_b"), $"df".as("df_b"))), "tok_b")
      .select($"tok_a", $"tok_b", $"n_ab", $"df_a", $"df_b",
        round($"n_ab" * $"n_docs" / ($"df_a" * $"df_b").cast("double"), 6)
          .as("pmi_ratio"))
      .orderBy($"tok_a", $"tok_b")
  }
  private val q105Sql =
    """WITH t AS (SELECT DISTINCT doc_id, unnest(list_filter(
      |    string_split(text, ' '), tk -> len(tk) >= 5)) AS tok FROM documents),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |m AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
      |p AS (SELECT x.tok AS tok_a, y.tok AS tok_b, count(*) AS n_ab
      |  FROM t x JOIN t y ON x.doc_id = y.doc_id AND x.tok < y.tok
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT p.tok_a, p.tok_b, p.n_ab, ma.df AS df_a, mb.df AS df_b,
      |  round(p.n_ab * (SELECT n_docs FROM nd)
      |    / CAST(ma.df * mb.df AS DOUBLE), 6) AS pmi_ratio
      |FROM p
      |JOIN m ma ON p.tok_a = ma.tok
      |JOIN m mb ON p.tok_b = mb.tok
      |ORDER BY tok_a, tok_b""".stripMargin

  /** q150: GLOBAL shard manifest — q73's token bin-packing without a
    * partition key: every document's starting offset in the corpus-wide
    * doc_id order, computed through the distributed scan
    * ([[graft.operators.DistributedScan.prefixSums]]) instead of a
    * single-partition window, then 50k-token shard ids by integer
    * division. The per-shard manifest (counts, token totals, id range)
    * is what a trainer's data loader consumes; a global ordered window
    * here would serialize the whole corpus through one task — the scan
    * is the operator that makes corpus-wide ordered layout scale. */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 50000L
    val toks = Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
    graft.operators.DistributedScan.prefixSums(toks, Seq($"doc_id"), Seq("n_tok"))
      .withColumn("shard", expr(s"(n_tok_cum - n_tok) div $budget"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("shard_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"shard")
  }
  private val q150Sql =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |    sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t),
      |b AS (SELECT doc_id, n_tok, CAST((cum - n_tok) // 50000 AS BIGINT) AS shard FROM c)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM b GROUP BY shard ORDER BY shard""".stripMargin

  /** q211: top-n-gram mass — the fraction of a document's bigram slots
    * occupied by its single most frequent bigram (Gopher-style
    * "fraction of characters in the most common n-gram" repetition
    * filter, token-bigram form; Rae et al. 2022 §A1.1 — the signal that
    * catches boilerplate q71's DISTINCT ratio misses: one phrase
    * repeated many times among otherwise-diverse text). Per-doc bigram
    * counting is one per-row transform + hash agg keyed (doc, bigram);
    * the winner is selected map-side by `min(struct(-cnt, bigram))` —
    * highest count, lexicographically-first tie-break, no window sort
    * anywhere. Share divides once at the end, 6 dp. */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .where(size($"w") >= 2)
      .select($"doc_id", (size($"w") - 1).as("n_bigrams"),
        explode(expr(
          "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"))
          .as("bg"))
      .groupBy($"doc_id", $"n_bigrams", $"bg").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id", $"n_bigrams")
      .agg(min(struct((-$"cnt").as("neg"), $"bg".as("bg"))).as("top"))
      .select($"doc_id", $"n_bigrams", $"top.bg".as("top_bigram"),
        (-$"top.neg").as("top_cnt"))
      .withColumn("top_share", round($"top_cnt" / $"n_bigrams".cast("double"), 6))
      .orderBy($"doc_id")
  }
  private val q211Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, len(w) - 1 AS n_bigrams,
      |    w[s.i] || ' ' || w[s.i + 1] AS bg
      |  FROM t, UNNEST(range(1, len(w))) AS s(i) WHERE len(w) >= 2),
      |c AS (SELECT doc_id, n_bigrams, bg, count(*) AS cnt
      |  FROM p GROUP BY doc_id, n_bigrams, bg),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY cnt DESC, bg) AS rn FROM c)
      |SELECT doc_id, n_bigrams, bg AS top_bigram, cnt AS top_cnt,
      |  round(cnt / CAST(n_bigrams AS DOUBLE), 6) AS top_share
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** q219: deterministic in-batch negative sampling — the contrastive-
    * training step that pairs every anchor with k negatives drawn from
    * its OWN batch (the in-batch-negatives discipline: no global
    * candidate pool ever materializes). Batches are the q149/q60 hash
    * ring: bucket = 16-bit md5 bucket of vec_id mod B, with B sized so
    * batches hold ~32 vectors (B derives from one bounded count — the
    * only driver scalar). Negatives are same-batch vectors of a
    * DIFFERENT label, ranked by the pair hash md5(anchor:cand) — a pure
    * function of the ids, so the sample is reproducible run-over-run,
    * epoch-salt-able, and partitioning-independent. Candidate fan-out is
    * batch-bounded (~32 rows per anchor, whatever the corpus size); the
    * shuffle key is the batch id. Anchors whose batch lacks other-label
    * members emit nothing — pinned by the gate, and the signal to
    * re-salt batches in production. */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val n = emb.count()                        // bounded driver scalar
    val b = math.max(1L, (n + 31L) / 32L)
    val batched = emb.withColumn("batch",
      pmod(CurationQueries.hashBucket("vec_id"), lit(b)))
    val cand = batched.as("a").join(batched.as("b"),
        $"a.batch" === $"b.batch" && $"a.label" =!= $"b.label")
      .select($"a.vec_id".as("anchor_id"), $"a.batch".as("batch"),
        $"b.vec_id".as("neg_id"), $"b.label".as("neg_label"),
        md5(concat($"a.vec_id".cast("string"), lit(":"),
          $"b.vec_id".cast("string"))).as("ph"))
    val w = Window.partitionBy($"anchor_id").orderBy($"ph", $"neg_id")
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 4)
      .select($"anchor_id", $"rk", $"neg_id", $"neg_label", $"batch")
      .orderBy($"anchor_id", $"rk")
  }
  private val q219Sql = {
    val bucket = CurationQueries.duckBucket("vec_id")
    s"""WITH nn AS (SELECT greatest(1, (count(*) + 31) // 32) AS b
      |  FROM embeddings),
      |e AS (SELECT vec_id, label, $bucket % (SELECT b FROM nn) AS batch
      |  FROM embeddings),
      |c AS (SELECT a.vec_id AS anchor_id, a.batch AS batch,
      |    b.vec_id AS neg_id, b.label AS neg_label,
      |    md5(CAST(a.vec_id AS VARCHAR) || ':' || CAST(b.vec_id AS VARCHAR))
      |      AS ph
      |  FROM e a JOIN e b ON a.batch = b.batch AND a.label <> b.label),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
      |    ORDER BY ph, neg_id) AS BIGINT) AS rk FROM c)
      |SELECT anchor_id, rk, neg_id, neg_label, batch
      |FROM r WHERE rk <= 4 ORDER BY anchor_id, rk""".stripMargin
  }

  /** q309: K-FOLD out-of-fold TARGET ENCODING — the leakage-safe way to
    * turn a high-cardinality categorical (supplier) into a numeric
    * feature (its return rate): a row in fold f gets the category's rate
    * computed from the OTHER folds only, so the feature never sees its
    * own row's label (the standard CV-encoding discipline; in-fold means
    * leak the target and inflate offline metrics). Folds key on
    * l_orderkey % 5 — resharding-stable like q60's hash split. Cold
    * start is the real-world wrinkle the gate pins: a supplier seen ONLY
    * in fold f has an empty out-of-fold slice and falls back to the
    * GLOBAL out-of-fold prior (flagged, so downstream can regularize
    * differently); rates are exact half-up ppm (the (2e6·num+den) div
    * (2·den) idiom), numerator and denominator emitted alongside.
    *
    * Scale shape: one grouped pass to |supplier|×|folds| cells, then
    * windows over ≤5-row partitions and one 5-row broadcast of the
    * per-fold global totals — the encoding TABLE is what this computes;
    * applying it is a broadcast join against the training rows. */
  private def q309(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.lineitem(s, dir)
      .select($"l_suppkey", pmod($"l_orderkey", lit(5L)).as("fold"),
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("y"))
    val cells = rows.groupBy($"l_suppkey", $"fold")
      .agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val wSupp = Window.partitionBy($"l_suppkey")
    // per-fold global totals: |folds| rows; the grand total rides a
    // broadcast scalar cross join, not an unpartitioned window
    val g = rows.groupBy($"fold")
      .agg(count(lit(1)).as("gn"), sum($"y").as("gs"))
    val gg = g.crossJoin(broadcast(
        g.agg(sum($"gn").as("tn"), sum($"gs").as("ts"))))
      .select($"fold", ($"ts" - $"gs").as("g_num"), ($"tn" - $"gn").as("g_den"))
    cells
      .withColumn("oof_num", sum($"s").over(wSupp) - $"s")
      .withColumn("oof_den", sum($"n").over(wSupp) - $"n")
      .join(broadcast(gg), Seq("fold"))
      .select($"l_suppkey", $"fold", $"n".as("n_rows"),
        $"oof_num", $"oof_den",
        ($"oof_den" === 0L).as("used_fallback"),
        expr("CASE WHEN oof_den > 0 " +
          "THEN (2000000 * oof_num + oof_den) div (2 * oof_den) " +
          "ELSE (2000000 * g_num + g_den) div (2 * g_den) END").as("enc_ppm"))
      .orderBy($"l_suppkey", $"fold")
  }
  private val q309Sql =
    """WITH rows_ AS (SELECT l_suppkey, l_orderkey % 5 AS fold,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |cells AS (SELECT l_suppkey, fold, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s FROM rows_ GROUP BY 1, 2),
      |g AS (SELECT fold, CAST(count(*) AS BIGINT) AS gn,
      |    CAST(sum(y) AS BIGINT) AS gs FROM rows_ GROUP BY 1),
      |gg AS (SELECT fold, CAST(sum(gs) OVER () - gs AS BIGINT) AS g_num,
      |    CAST(sum(gn) OVER () - gn AS BIGINT) AS g_den FROM g),
      |enc AS (SELECT c.l_suppkey, c.fold, c.n,
      |    CAST(sum(c.s) OVER (PARTITION BY c.l_suppkey) - c.s AS BIGINT)
      |      AS oof_num,
      |    CAST(sum(c.n) OVER (PARTITION BY c.l_suppkey) - c.n AS BIGINT)
      |      AS oof_den
      |  FROM cells c)
      |SELECT e.l_suppkey, e.fold, e.n AS n_rows, e.oof_num, e.oof_den,
      |  e.oof_den = 0 AS used_fallback,
      |  CASE WHEN e.oof_den > 0
      |    THEN (2000000 * e.oof_num + e.oof_den) // (2 * e.oof_den)
      |    ELSE (2000000 * gg.g_num + gg.g_den) // (2 * gg.g_den) END AS enc_ppm
      |FROM enc e JOIN gg USING (fold)
      |ORDER BY e.l_suppkey, e.fold""".stripMargin

  /** q340: SEQUENCE PACKING attribution — the concatenate-and-chunk
    * packing every GPT-style pre-training pipeline runs (corpus token
    * stream in doc_id order, cut into fixed L=256-token training
    * sequences), emitted at the DOCUMENT grain: each doc's global token
    * offset, the first/last sequence it lands in, and whether the
    * context-length boundary SPLITS it (the fragmentation signal that
    * drives doc-boundary-aware packing variants). Unlike q62 (per-doc
    * chunking with overlap) and q73 (per-LANGUAGE bin summaries via a
    * lang-partitioned window), the offsets here are corpus-GLOBAL —
    * a running sum, computed by [[graft.operators.DistributedScan
    * .prefixSums]] (range repartition + per-partition sums + a
    * |partitions|-row offset broadcast), so there is NO single-partition
    * window anywhere; everything after the scan is per-row arithmetic. */
  private def q340(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val L = 256L
    val base = Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
    graft.operators.DistributedScan.prefixSums(base, Seq(col("doc_id")), Seq("n_tok"))
      .select($"doc_id", $"n_tok",
        ($"n_tok_cum" - $"n_tok").as("offset"),
        expr("(n_tok_cum - n_tok) div 256").as("first_seq"),
        expr("(n_tok_cum - 1) div 256").as("last_seq"))
      .withColumn("n_seqs", $"last_seq" - $"first_seq" + 1)
      .withColumn("is_split", ($"n_seqs" > 1).cast("long"))
      .orderBy($"doc_id")
  }
  private val q340Sql =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d)
      |SELECT doc_id, n_tok, cum - n_tok AS "offset",
      |  (cum - n_tok) // 256 AS first_seq,
      |  (cum - 1) // 256 AS last_seq,
      |  (cum - 1) // 256 - (cum - n_tok) // 256 + 1 AS n_seqs,
      |  CAST((cum - 1) // 256 > (cum - n_tok) // 256 AS BIGINT) AS is_split
      |FROM c ORDER BY doc_id""".stripMargin

  /** q341: packed-sequence COMPOSITION audit — q340's reverse grain: for
    * every L=256-token training sequence, how many documents contribute
    * tokens to it, how many START inside it, and whether it is
    * single-doc pure (attention-mask-free) — the stats that size
    * cross-document-attention contamination in naive packing. Derived
    * from q340's per-doc spans by an explode over each doc's touched
    * sequence range (≤ n_tok/L + 1 rows per doc — output-sized, never
    * quadratic) and one grouped count. */
  private def q341(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val L = 256L
    val base = Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
    val spans = graft.operators.DistributedScan
      .prefixSums(base, Seq(col("doc_id")), Seq("n_tok"))
      .select($"doc_id", $"n_tok",
        expr("(n_tok_cum - n_tok) div 256").as("first_seq"),
        expr("(n_tok_cum - 1) div 256").as("last_seq"))
    spans.select($"doc_id", $"first_seq",
        explode(sequence($"first_seq", $"last_seq")).as("seq_id"))
      .groupBy($"seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"first_seq" === $"seq_id", 1L).otherwise(0L)).as("n_starts"),
        min($"doc_id").as("first_doc"))
      .withColumn("is_pure", ($"n_docs" === 1).cast("long"))
      .orderBy($"seq_id")
  }
  private val q341Sql =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d),
      |sp AS (SELECT doc_id, (cum - n_tok) // 256 AS first_seq,
      |    (cum - 1) // 256 AS last_seq FROM c),
      |e AS (SELECT doc_id, first_seq,
      |    unnest(range(first_seq, last_seq + 1)) AS seq_id FROM sp)
      |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN first_seq = seq_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_starts,
      |  min(doc_id) AS first_doc,
      |  CAST(count(*) = 1 AS BIGINT) AS is_pure
      |FROM e GROUP BY seq_id ORDER BY seq_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q340_sequence_packing", q340, Some(q340Sql)),
    QueryDef("q341_packed_seq_audit", q341, Some(q341Sql)),
    QueryDef("q309_target_encoding", q309, Some(q309Sql)),
    QueryDef("q71_repetition_ratio", q71, Some(q71Sql)),
    QueryDef("q211_top_ngram_mass", q211, Some(q211Sql)),
    QueryDef("q219_negative_sampling", q219, Some(q219Sql)),
    QueryDef("q150_shard_manifest", q150, Some(q150Sql)),
    QueryDef("q72_embedding_quantization", q72, Some(q72Sql)),
    QueryDef("q73_sequence_packing", q73, Some(q73Sql)),
    QueryDef("q105_pmi_cooccurrence", q105, Some(q105Sql)),
  )
}
