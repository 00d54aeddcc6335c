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
    val rows = keys.select($"t",
        explode(array((0 until 4).map(lit): _*)).as("j"))
      .select($"j", (hexCol(concat($"j".cast("string"), $"t"), 1, 8)
        % wBuckets).as("bkt"))
    val sketch = rows.groupBy($"j", $"bkt").agg(count(lit(1)).as("c"))
    val top = keys.groupBy($"t").agg(count(lit(1)).as("true_cnt"))
      .orderBy($"true_cnt".desc, $"t").limit(10)
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

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q358_bloom_decontaminate", q358, Some(q358Sql)),
    QueryDef("q359_countmin_sketch", q359, Some(q359Sql)),
  )
}
