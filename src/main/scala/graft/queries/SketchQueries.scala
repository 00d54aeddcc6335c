package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators for corpus-scale membership and frequency:
  * Bloom-filter decontamination (q358) and a count-min frequency sketch
  * (q359). Both are the patterns a 100 TB pipeline reaches for when the
  * exact structure (a distinct set / an exact count table) no longer
  * fits: the sketch is FIXED-SIZE, built with one combinable aggregate,
  * and broadcast back over the corpus — no data-sized shuffle on the
  * consult path. Both gates also compute the EXACT answer next to the
  * sketch answer, so the error the sketch introduces is measured inside
  * the hash gate, not asserted (Bloom false-positive count, count-min
  * overestimates), and one-sided-error invariants fail LOUDLY per row
  * (a Bloom false negative / a count-min underestimate would mean the
  * two engines hashed differently).
  *
  * Engine portability: every hash is md5-hex arithmetic (the repo's
  * minhash discipline — no hash-seed drift between Spark and DuckDB);
  * bit positions pack into 32-bit words so no shift ever touches the
  * BIGINT sign bit (DuckDB raises on 1<<63 where the JVM wraps).
  *
  * Relationship to q87/q88 (the NATIVE-kernel sketch gates): q87 routes
  * Spark's own runtime-filter Bloom through a join and gates "plan
  * changed, answer identical"; q88 routes the built-in
  * `count_min_sketch` aggregate and gates its one-sided CONTRACT
  * bounds. Those certify the engine kernels; these two certify the
  * sketch ARITHMETIC itself — every set bit / every cell count is
  * hash-replayed in DuckDB, collisions included — and exercise the
  * workflow the kernels don't (cross-split decontamination with
  * measured false positives).
  */
object SketchQueries extends QueryModule {

  /** First `len` hex digits of md5(expr) as an integer, in DuckDB. */
  private def duckHex(expr: String, start: Int, len: Int): String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5($expr), $i, 1)) - 1)"
    (start until start + len).zipWithIndex
      .map { case (i, k) =>
        s"CAST(${digit(i)} AS BIGINT) * ${java.lang.Long.toString(1L << (4 * (len - 1 - k)))}" }
      .mkString("(", " + ", ")")
  }
  private def hexCol(c: Column, start: Int, len: Int): Column =
    conv(substring(md5(c), start, len), 16, 10).cast("long")

  /** q358: BLOOM-FILTER decontamination — the production shape for
    * "remove eval n-grams from a 100 TB train corpus": the exact-join
    * decontamination (q63) shuffles the corpus on the gram key; the
    * Bloom build instead folds the train side's sampled word-4-gram
    * fingerprints into a FIXED 2¹⁷-bit filter (one combinable bit_or
    * aggregate → a ≤4096-row word table, broadcastable at ANY corpus
    * size), and the eval side probes it map-side. k = 2 md5-derived
    * hash positions per gram; fingerprints are the md5-sampled 1/8
    * subset (the MinHash-style selection that bounds filter load
    * independent of document length). The gate scores the sketch
    * against exact membership computed alongside: per source —
    * eval docs, probed grams, Bloom hits, TRUE hits, false positives
    * (Bloom − true), and flagged docs. A Bloom FALSE NEGATIVE is
    * impossible when both engines hash identically, so a row with
    * (true ∧ ¬bloom) raises mid-job rather than skewing the counts.
    *
    * Scale shape: build = projection → distinct on the sampled-gram key
    * (combinable) → ≤4096-row bit_or aggregate; probe = two broadcast
    * joins of the word table + per-(source, doc) roll-up. The ONLY
    * data-sized shuffle is the exactness baseline's semi-join — which
    * exists precisely to measure what the production path avoids. */
  private def q358(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mBits = 131072L // 2^17
    val docs = Tables.documents(s, dir)
      .withColumn("split", CurationQueries.splitColumn("doc_id"))
      .select($"doc_id", $"source", $"split", split($"text", " ").as("w"))
      .filter(size($"w") >= 4)
    val grams = docs.select($"doc_id", $"source", $"split",
        explode(expr("transform(sequence(1, size(w) - 3), " +
          "i -> array_join(slice(w, i, 4), chr(31)))")).as("g"))
      .filter(hexCol($"g", 17, 4) % 8 === 0) // sampled fingerprints
    val trainG = grams.filter($"split" === "train").select($"g").distinct()
      .localCheckpoint(false) // consumed by the bitmap AND the exact base
    // the filter: distinct bit positions -> 32-bit-packed word table
    val bloom = trainG
      .select(explode(array(hexCol($"g", 1, 8) % mBits,
        hexCol($"g", 9, 8) % mBits)).as("p"))
      .distinct()
      .select(expr("p div 32").as("wd"),
        expr("shiftleft(1L, cast(p % 32 as int))").as("b"))
      .groupBy($"wd").agg(expr("bit_or(b)").as("bits"))
    val evalG = grams.filter($"split" === "eval")
      .select($"source", $"doc_id", $"g").distinct()
      .withColumn("p1", hexCol($"g", 1, 8) % mBits)
      .withColumn("p2", hexCol($"g", 9, 8) % mBits)
    val probed = evalG
      .join(broadcast(bloom.withColumnRenamed("wd", "w1")),
        expr("p1 div 32") === $"w1", "left")
      .withColumn("hit1",
        expr("bits & shiftleft(1L, cast(p1 % 32 as int))") =!= 0L
          && $"bits".isNotNull)
      .drop("w1", "bits")
      .join(broadcast(bloom.withColumnRenamed("wd", "w2")),
        expr("p2 div 32") === $"w2", "left")
      .withColumn("hit2",
        expr("bits & shiftleft(1L, cast(p2 % 32 as int))") =!= 0L
          && $"bits".isNotNull)
      .withColumn("bloom_hit", coalesce($"hit1", lit(false)) &&
        coalesce($"hit2", lit(false)))
      .join(trainG.withColumnRenamed("g", "tg"),
        $"g" === $"tg", "left")
      .withColumn("true_hit", $"tg".isNotNull)
      // one-sided-error invariant, enforced loudly in the same job
      .withColumn("fn_ok", when($"true_hit" && !$"bloom_hit",
          raise_error(lit("q358: Bloom false negative — the two hash " +
            "paths diverged")).cast("boolean"))
        .otherwise(lit(true)))
      .filter($"fn_ok")
    probed.groupBy($"source")
      .agg(countDistinct($"doc_id").as("n_eval_docs"),
        count(lit(1)).as("n_grams"),
        sum($"bloom_hit".cast("long")).as("bloom_hits"),
        sum($"true_hit".cast("long")).as("true_hits"),
        (sum($"bloom_hit".cast("long")) - sum($"true_hit".cast("long")))
          .as("false_positives"),
        countDistinct(when($"bloom_hit", $"doc_id")).as("flagged_docs"))
      .orderBy($"source")
  }
  private val q358Sql = {
    val b = CurationQueries.duckBucket("doc_id")
    s"""WITH d AS (SELECT doc_id, source,
      |    CASE WHEN $b % 100 < 10 THEN 'eval' ELSE 'train' END AS split,
      |    string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 4),
      |g0 AS (SELECT doc_id, source, split,
      |    unnest(list_transform(range(1, len(w) - 3 + 1),
      |      i -> array_to_string(w[i:i+3], chr(31)))) AS g
      |  FROM d),
      |g AS (SELECT * FROM g0 WHERE ${duckHex("g", 17, 4)} % 8 = 0),
      |tg AS (SELECT DISTINCT g FROM g WHERE split = 'train'),
      |pos AS (SELECT DISTINCT p FROM (
      |  SELECT ${duckHex("g", 1, 8)} % 131072 AS p FROM tg
      |  UNION ALL SELECT ${duckHex("g", 9, 8)} % 131072 FROM tg)),
      |bloom AS (SELECT p // 32 AS wd,
      |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
      |  FROM pos GROUP BY 1),
      |eg AS (SELECT DISTINCT source, doc_id, g,
      |    ${duckHex("g", 1, 8)} % 131072 AS p1,
      |    ${duckHex("g", 9, 8)} % 131072 AS p2
      |  FROM g WHERE split = 'eval'),
      |pr AS (SELECT e.source, e.doc_id, e.g,
      |    coalesce((b1.bits & (CAST(1 AS BIGINT)
      |      << CAST(e.p1 % 32 AS INTEGER))) <> 0, FALSE)
      |    AND coalesce((b2.bits & (CAST(1 AS BIGINT)
      |      << CAST(e.p2 % 32 AS INTEGER))) <> 0, FALSE) AS bloom_hit,
      |    EXISTS (SELECT 1 FROM tg t WHERE t.g = e.g) AS true_hit
      |  FROM eg e
      |  LEFT JOIN bloom b1 ON e.p1 // 32 = b1.wd
      |  LEFT JOIN bloom b2 ON e.p2 // 32 = b2.wd)
      |SELECT source,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_eval_docs,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
      |    AS bloom_hits,
      |  CAST(sum(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT)
      |    AS true_hits,
      |  CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
      |    - sum(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT)
      |    AS false_positives,
      |  CAST(count(DISTINCT CASE WHEN bloom_hit THEN doc_id END) AS BIGINT)
      |    AS flagged_docs
      |FROM pr GROUP BY source ORDER BY source""".stripMargin
  }

  /** q359: COUNT-MIN frequency sketch (Cormode & Muthukrishnan 2005) —
    * the fixed-size answer to "how often does each key occur" when the
    * key space outgrows an exact count table: d = 4 hash rows × w = 256
    * buckets, each cell a combinable COUNT, point estimate = min over
    * the 4 rows. Keys are word BIGRAMS (the corpus's ~10³-key frequency
    * surface, deliberately larger than w so collisions — the thing the
    * sketch trades for fixed size — actually happen and the error is
    * MEASURED, not vacuously zero). The gate builds the sketch over the
    * whole corpus, probes it with the EXACT top-10 bigrams (tie rule
    * count DESC, key ASC), and emits true count, sketch estimate, and
    * the (provably non-negative) overestimate per probe — an
    * UNDERESTIMATE would mean engine hash divergence and raises mid-job
    * rather than producing a wrong row.
    *
    * Scale shape: the sketch is ONE map-side-combinable (row, bucket)
    * count bounded at d·w = 1024 cells regardless of corpus size; the
    * probe side is a 10-row broadcast. The exact top-10 baseline is
    * itself a combinable count + bounded top-k — the gate's measurement
    * apparatus, not the production path. */
  private def q359(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wBuckets = 256L
    val keys = Tables.documents(s, dir)
      .select(split($"text", " ").as("w"))
      .filter(size($"w") >= 2)
      .select(explode(expr("transform(sequence(1, size(w) - 1), " +
        "i -> array_join(slice(w, i, 2), chr(31)))")).as("t"))
    // Round-15 (guide §2.3 "aggregate before you shuffle", applied to the
    // hash kernel): count per DISTINCT bigram first, then hash only the
    // ~10^3 distinct keys ×4 rows instead of every occurrence ×4 — the
    // sketch cell count(*) over occurrences equals sum(per-key count)
    // over distinct keys landing in the cell, bit-identically, and the
    // md5 kernel (the gate's dominant per-row cost) shrinks from 4·N to
    // 4·|distinct|. The same grouped count is the exact top-10 baseline.
    val cnt = keys.groupBy($"t").agg(count(lit(1)).as("true_cnt"))
    val rows = cnt.select($"t", $"true_cnt",
        explode(array((0 until 4).map(lit): _*)).as("j"))
      .select($"true_cnt", $"j",
        (hexCol(concat($"j".cast("string"), $"t"), 1, 8)
          % wBuckets).as("bkt"))
    val sketch = rows.groupBy($"j", $"bkt").agg(sum($"true_cnt").as("c"))
    val top = cnt.orderBy($"true_cnt".desc, $"t").limit(10)
    val probes = top.select($"t", $"true_cnt",
        explode(array((0 until 4).map(lit): _*)).as("j"))
      .select($"t", $"true_cnt", $"j",
        (hexCol(concat($"j".cast("string"), $"t"), 1, 8) % wBuckets)
          .as("bkt"))
    probes.join(sketch, Seq("j", "bkt"))
      .groupBy($"t", $"true_cnt")
      .agg(min($"c").as("cm_estimate"))
      .withColumn("over_ok", when($"cm_estimate" < $"true_cnt",
          raise_error(lit("q359: count-min underestimate — the two " +
            "hash paths diverged")).cast("boolean"))
        .otherwise(lit(true)))
      .filter($"over_ok").drop("over_ok")
      .withColumn("overestimate", $"cm_estimate" - $"true_cnt")
      .select(expr("replace(t, chr(31), ' ')").as("bigram"),
        $"true_cnt", $"cm_estimate", $"overestimate")
      .orderBy($"true_cnt".desc, $"bigram")
  }
  private val q359Sql = {
    val h = duckHex("CAST(j AS VARCHAR) || t", 1, 8)
    s"""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |tk AS (SELECT unnest(list_transform(range(1, len(w)),
      |    i -> array_to_string(w[i:i+1], chr(31)))) AS t FROM d),
      |rows0 AS (SELECT t, j.j AS j FROM tk, UNNEST(range(0, 4)) AS j(j)),
      |sk AS (SELECT j, $h % 256 AS bkt, CAST(count(*) AS BIGINT) AS c
      |  FROM rows0 GROUP BY 1, 2),
      |top AS (SELECT t, CAST(count(*) AS BIGINT) AS true_cnt FROM tk
      |  GROUP BY t ORDER BY true_cnt DESC, t LIMIT 10),
      |pr AS (SELECT top.t, top.true_cnt, j.j AS j,
      |    ${duckHex("CAST(j.j AS VARCHAR) || top.t", 1, 8)} % 256 AS bkt
      |  FROM top, UNNEST(range(0, 4)) AS j(j))
      |SELECT replace(pr.t, chr(31), ' ') AS bigram, pr.true_cnt,
      |  CAST(min(sk.c) AS BIGINT) AS cm_estimate,
      |  CAST(min(sk.c) - pr.true_cnt AS BIGINT) AS overestimate
      |FROM pr JOIN sk ON pr.j = sk.j AND pr.bkt = sk.bkt
      |GROUP BY 1, 2 ORDER BY true_cnt DESC, bigram""".stripMargin
  }

  /** The 33-branch integer ρ ladder (leading-zero count of a 32-bit
    * value, +1) as a CASE expression — ONE generated string used
    * verbatim by both the Spark plan and the DuckDB oracle, so the
    * register arithmetic cannot drift between engines. */
  private def rhoCase(v: String): String =
    "CASE " + (1 to 32).map(k =>
      s"WHEN $v >= ${1L << (32 - k)} THEN $k").mkString(" ") + " ELSE 33 END"

  /** α·m² for m = 256 registers (Flajolet et al. 2007) =
    * 0.7213/(1 + 1.079/256) · 256², precomputed to ONE double literal
    * and CAST on both engines (DuckDB would otherwise parse the factor
    * as DECIMAL and overflow the product). */
  private val hllAlphaM2 = "CAST(47072.71267120224 AS DOUBLE)"

  /** q361: PORTABLE HyperLogLog — the engine-agnostic twin of q81 (which
    * routes Spark's native Datasketches kernel and gates its CONTRACT):
    * here the register arithmetic itself is the gate. m = 256 registers;
    * per token, register index = md5 hex[1..2] (8 bits) and ρ = leading-
    * zero count of hex[3..10] (32 bits) + 1 via the shared [[rhoCase]]
    * ladder; per (source, register) the sketch keeps MAX(ρ). The gate
    * emits the integer register-state invariants that pin the sketch
    * EXACTLY (non-zero register count, Σρ), the raw HLL estimate, and
    * the exact distinct count — plus the '__all__' UNION row (max per
    * register across sources), proving mergeability, the property that
    * makes HLL the fleet-scale count-distinct.
    *
    * Float determinism of the estimate: the indicator sum
    * S = Σ_j 2^(−M_j) is a sum of ≤256 exact powers of two spanning
    * < 53 bits of magnitude, so S is EXACT in double under ANY
    * accumulation order — the one division α·m²/S is then correctly
    * rounded identically on both engines, and 6-dp rounding seals it.
    *
    * Scale shape: registers are a (source, idx) MAX aggregate —
    * map-side-combinable, bounded at |sources|·256 rows at any corpus
    * size; the union is a 256-row aggregate. The exact countDistinct
    * rides alongside as the gate's measurement apparatus. */
  private def q361(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val withReg = toks
      .withColumn("idx", hexCol($"tok", 1, 2))
      .withColumn("rho", expr(rhoCase(
        "conv(substring(md5(tok), 3, 8), 16, 10)")).cast("int"))
    val regs = withReg.groupBy($"source", $"idx")
      .agg(max($"rho").as("r"))
      .localCheckpoint(false) // consumed by per-source AND union paths
    // per-source register roll-up: n nonzero, sum rho, indicator sum
    // (the power(0.5, r) terms are exact powers of two — see scaladoc)
    val per = regs.groupBy($"source")
      .agg(count(lit(1)).as("nonzero_regs"),
        sum($"r").cast("long").as("sum_rho"),
        sum(expr("power(0.5, cast(r as double))")).as("s1"))
      .withColumn("raw_e",
        expr(hllAlphaM2) / ($"s1" + (lit(256) - $"nonzero_regs")))
      .withColumn("raw_est", round($"raw_e", 6))
      // Flajolet small-range (linear counting) correction: with V empty
      // registers and raw <= 2.5m, m*ln(m/V) is the better estimator;
      // ln is the one data-dependent transcendental (6-dp round seals
      // the <=1-ulp libm difference, the q237/q236 discipline)
      .withColumn("estimate", when(
          $"raw_e" <= 640.0 && $"nonzero_regs" < 256,
          round(lit(256.0) * log(lit(256.0) / (lit(256) - $"nonzero_regs")), 6))
        .otherwise(round($"raw_e", 6)))
    val exacts = toks.groupBy($"source")
      .agg(countDistinct($"tok").as("exact_distinct"))
    val perOut = per.join(exacts, "source")
      .select($"source", $"nonzero_regs", $"sum_rho", $"raw_est",
        $"estimate", $"exact_distinct")
    val union = regs.groupBy($"idx").agg(max($"r").as("r"))
      .agg(count(lit(1)).as("nonzero_regs"),
        sum($"r").cast("long").as("sum_rho"),
        sum(expr("power(0.5, cast(r as double))")).as("s1"))
      .withColumn("raw_e",
        expr(hllAlphaM2) / ($"s1" + (lit(256) - $"nonzero_regs")))
      .withColumn("raw_est", round($"raw_e", 6))
      .withColumn("estimate", when(
          $"raw_e" <= 640.0 && $"nonzero_regs" < 256,
          round(lit(256.0) * log(lit(256.0) / (lit(256) - $"nonzero_regs")), 6))
        .otherwise(round($"raw_e", 6)))
      .crossJoin(toks.agg(countDistinct($"tok").as("exact_distinct")))
      .select(lit("__all__").as("source"), $"nonzero_regs", $"sum_rho",
        $"raw_est", $"estimate", $"exact_distinct")
    perOut.unionByName(union).orderBy($"source")
  }
  private val q361Sql = {
    val idx = duckHex("tok", 1, 2)
    val v = duckHex("tok", 3, 8)
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tk AS (SELECT source, tok FROM toks WHERE len(tok) > 0),
      |wr AS (SELECT source, tok, $idx AS idx,
      |    ${rhoCase(s"($v)")} AS rho FROM tk),
      |regs AS (SELECT source, idx, max(rho) AS r FROM wr GROUP BY 1, 2),
      |per AS (SELECT source, CAST(count(*) AS BIGINT) AS nonzero_regs,
      |    CAST(sum(r) AS BIGINT) AS sum_rho,
      |    sum(power(0.5, r)) AS s1
      |  FROM regs GROUP BY 1),
      |ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT)
      |    AS exact_distinct FROM tk GROUP BY 1),
      |u AS (SELECT idx, max(r) AS r FROM regs GROUP BY 1),
      |uni AS (SELECT CAST(count(*) AS BIGINT) AS nonzero_regs,
      |    CAST(sum(r) AS BIGINT) AS sum_rho, sum(power(0.5, r)) AS s1
      |  FROM u),
      |est AS (SELECT source, nonzero_regs, sum_rho,
      |    $hllAlphaM2 / (s1 + (256 - nonzero_regs)) AS raw_e
      |  FROM per),
      |uest AS (SELECT nonzero_regs, sum_rho,
      |    $hllAlphaM2 / (s1 + (256 - nonzero_regs)) AS raw_e
      |  FROM uni)
      |SELECT e.source, e.nonzero_regs, e.sum_rho,
      |  round(e.raw_e, 6) AS raw_est,
      |  CASE WHEN e.raw_e <= 640.0 AND e.nonzero_regs < 256
      |    THEN round(256.0 * ln(256.0 / (256 - e.nonzero_regs)), 6)
      |    ELSE round(e.raw_e, 6) END AS estimate,
      |  ex.exact_distinct
      |FROM est e JOIN ex USING (source)
      |UNION ALL
      |SELECT '__all__', nonzero_regs, sum_rho, round(raw_e, 6),
      |  CASE WHEN raw_e <= 640.0 AND nonzero_regs < 256
      |    THEN round(256.0 * ln(256.0 / (256 - nonzero_regs)), 6)
      |    ELSE round(raw_e, 6) END,
      |  (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM tk)
      |FROM uest
      |ORDER BY source""".stripMargin
  }

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q358_bloom_decontaminate", q358, Some(q358Sql)),
    QueryDef("q359_countmin_sketch", q359, Some(q359Sql)),
    QueryDef("q361_portable_hll", q361, Some(q361Sql)),
  )
}
