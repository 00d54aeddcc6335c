package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy matching of near-identical identifier strings
  * (the record-linkage step of any dedup/master-data pipeline), plus a
  * Bloom-pruned join (the runtime row-filtering pattern).
  *
  * q86's sub-quadratic shape is DELETION-NEIGHBORHOOD blocking: each name
  * emits itself plus one variant per character position (the string with
  * that character removed). Any pair within Levenshtein distance 1 shares
  * a key — substitution pairs meet on the variant dropping the differing
  * position, insert/delete pairs meet on the shorter string itself, and
  * identical names meet on the full string — so the candidate set
  * provably contains EVERY distance<=1 pair regardless of length or
  * duplicates (no blocking recall loss). Shared keys can also admit
  * distance-2 pairs (transpositions like ab/ba share both deletion
  * variants), so the exact Levenshtein filter and a pair-level distinct
  * run after the join; block sizes stay tiny because a key pins all but
  * one character. A naive prefix block was measured 40x slower at sf0.1:
  * low-entropy key prefixes collapse to a handful of 1000-member blocks
  * whose quadratic kernels serialize on 15 join keys.
  */
object EntityResolutionQueries extends QueryModule {

  /** q86: complete Levenshtein<=1 self-join on customer names via
    * deletion-neighborhood keys, canonicalized cust_a < cust_b. The
    * oracle is the ALL-PAIRS quadratic ground truth — the blocked join
    * must reproduce it exactly, which is the completeness guarantee the
    * deletion keys provide. A pair can share several keys (duplicate
    * names share every key), so pairs deduplicate before output. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables.customer(s, dir)
      .select($"c_custkey", $"c_name",
        explode(expr(
          "array_union(array(c_name), transform(sequence(1, length(c_name)), " +
            "i -> concat(substring(c_name, 1, i - 1), " +
            "substring(c_name, i + 1, length(c_name)))))")).as("k"))
    keyed.as("a").join(keyed.as("b").hint("shuffle_hash"),
        $"a.k" === $"b.k" && $"a.c_custkey" < $"b.c_custkey")
      .select($"a.c_custkey".as("cust_a"), $"b.c_custkey".as("cust_b"),
        $"a.c_name".as("name_a"), $"b.c_name".as("name_b"))
      .distinct()
      .filter(levenshtein($"name_a", $"name_b") <= 1)
      .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
      .orderBy($"cust_a", $"cust_b")
  }
  private val q86Sql =
    """SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY cust_a, cust_b""".stripMargin

  /** q87: Bloom-pruned semi join — negative-balance customers' join keys
    * are aggregated into a few-KB Bloom filter (Spark's own runtime-filter
    * kernel, wrapped by `graft.bloom`), the event stream is pruned by a
    * scalar-subquery probe BEFORE the join's exchange, and the exact join
    * then removes the filter's false positives. The oracle is the plain
    * unpruned join: the Bloom stage must change the plan (fact rows
    * shuffled), never the answer. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.customer(s, dir)
      .filter($"c_acctbal" < 0)
      .select($"c_custkey".as("user_id"))
    val bloomDf = dim.agg(
      graft.functions.bloom.bloomAgg($"user_id", 65536L).as("bf"))
    Tables.events(s, dir)
      .select($"user_id", $"event_type", $"value")
      .filter(graft.functions.bloom.mightContain(bloomDf, $"user_id"))
      .join(dim, "user_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(18,6)")).cast("double"), 6).as("total_value"))
      .orderBy($"event_type")
  }
  private val q87Sql =
    """SELECT e.event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE c.c_acctbal < 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q306: fuzzy nearest-name lookup with the native Jaro–Winkler kernel
    * ([[org.apache.spark.sql.graft.JaroWinkler]]) — the record-linkage
    * metric q86's edit-distance join cannot express (JW weighs prefix
    * agreement and transpositions, the right shape for typo'd
    * identifiers). Every 7th customer probes for its best-JW match among
    * the customers in its key block (c_custkey div 100 — candidate
    * GENERATION is part of the gate's semantics and the oracle replays
    * it, the same contract as q27's LSH banding); similarity is emitted
    * in exact-BIGINT round-half-up ppm, so the hash pins the full Jaro
    * matching/transposition/boost arithmetic cell by cell against
    * DuckDB's independent `jaro_winkler_similarity` implementation, and
    * the argmax (ties → smallest candidate key) rides the bounded
    * [[graft.functions.aggregates.topKByScore]] aggregate — one
    * partial-combinable pass, no per-probe window sort. Scale shape: an
    * equi-join on the block id (balanced blocks of ≤100, no skew) plus
    * one map-side-combined aggregate; the JW kernel is a codegen'd
    * static call, per-pair O(|a|·|b|) on name-length strings. */
  private def q306(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
      .select($"c_custkey", $"c_name", expr("c_custkey div 100").as("blk"))
    val probes = c.filter($"c_custkey" % 7 === 0)
    probes.as("a").join(c.as("b"),
        $"a.blk" === $"b.blk" && $"a.c_custkey" =!= $"b.c_custkey")
      .select($"a.c_custkey".as("probe_key"), $"a.c_name".as("probe_name"),
        $"b.c_custkey".as("cand_key"),
        graft.functions.stringsim
          .jaroWinklerPpm($"a.c_name", $"b.c_name").as("ppm"))
      .groupBy($"probe_key", $"probe_name")
      .agg(graft.functions.aggregates
        .topKByScore($"ppm".cast("double"), $"cand_key", 1).as("top"))
      .select($"probe_key", $"probe_name",
        element_at($"top", 1).getField("id").as("match_key"),
        element_at($"top", 1).getField("score").cast("long").as("best_ppm"))
      .orderBy($"probe_key")
  }
  private val q306Sql =
    """WITH c AS (SELECT c_custkey, c_name, c_custkey // 100 AS blk
      |  FROM customer),
      |pairs AS (SELECT a.c_custkey AS probe_key, a.c_name AS probe_name,
      |    b.c_custkey AS cand_key,
      |    CAST(round(jaro_winkler_similarity(a.c_name, b.c_name) * 1000000)
      |      AS BIGINT) AS ppm
      |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey <> b.c_custkey
      |  WHERE a.c_custkey % 7 = 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY probe_key
      |    ORDER BY ppm DESC, cand_key) AS rk FROM pairs)
      |SELECT probe_key, probe_name, cand_key AS match_key, ppm AS best_ppm
      |FROM r WHERE rk = 1 ORDER BY probe_key""".stripMargin

  /** q331: END-TO-END entity resolution — the golden-record pipeline the
    * q86/q306/q67 components exist for, composed into one gate: plant
    * deterministic dirty aliases (every 13th customer gets a second
    * record with one character deleted at a key-derived position),
    * block, score with the native Jaro–Winkler expression, build match
    * edges with a similarity + structural feature rule, resolve
    * transitive clusters with [[graft.dedup.Dedup.connectedComponents]],
    * and emit one golden record per entity. Every stage is deterministic
    * and replayed by the oracle, so the hash pins the full pipeline —
    * blocking recall, the JW threshold cut, the closure, and the
    * canonical pick — not any single stage.
    *
    * Design notes: the deletion position is ≥ 9, so an alias keeps its
    * original's LAST-3 characters (deleting at p ≤ 15 of an 18-char name
    * shifts the tail but not the final trigram) — blocking on the name's
    * last trigram therefore has 100% recall on planted aliases BY
    * CONSTRUCTION, while splitting the corpus into ~10³ digit-derived
    * blocks (a different blocking family from q86's deletion
    * neighborhoods). The match rule is jw ≥ 0.98 ppm-exact AND unequal
    * lengths: on an 18-char template corpus, JW compresses near-key
    * SIBLINGS and true aliases into overlapping score bands, so the
    * structural length feature — aliases are 17 chars, originals 18 —
    * is what separates them, which is exactly how production linkage
    * rules mix similarity with record features. The 960,000 cut sits
    * below the measured worst planted-alias score: a clean deletion
    * scores 988,889 ppm, but deleting inside the digit run costs a
    * greedy-matching transposition and lands at 977,124 or 965,359
    * (measured over every alias at sf0.1) — the spec asserts the
    * resulting empirical recall is 1.0. Alias-to-FOREIGN-original
    * pairs land where they land and the closure merges what they
    * connect — the gate pins the outcome exactly rather than
    * asserting precision.
    *
    * Scale shape: alias planting is a projection; blocking is one
    * shuffle on the trigram key with quadratic kernels only inside
    * ~1/10³ blocks; JW runs codegen'd inside the join; the closure is
    * the q67 pointer-jumping loop (O(log diameter) rounds, state-sized
    * shuffles); the golden-record pick is one grouped aggregate + a
    * self-join on the root id. No stage is corpus-quadratic. */
  private def q331(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.customer(s, dir).select($"c_custkey", $"c_name")
    val aliases = base.filter($"c_custkey" % 13 === 0)
      .select(($"c_custkey" + 1000000000L).as("rid"),
        expr("substring(c_name, 1, 8 + cast(c_custkey % 7 as int)) || " +
          "substring(c_name, 10 + cast(c_custkey % 7 as int))").as("name"))
    val recs = base.select($"c_custkey".as("rid"), $"c_name".as("name"))
      .unionAll(aliases)
      .withColumn("blk", expr("substr(name, length(name) - 2, 3)"))
    val pairs = recs.as("a").join(recs.as("b"),
        $"a.blk" === $"b.blk" && $"a.rid" < $"b.rid" &&
          length($"a.name") =!= length($"b.name"))
      .select($"a.rid".as("ra"), $"b.rid".as("rb"),
        graft.functions.stringsim
          .jaroWinklerPpm($"a.name", $"b.name").as("jw"))
      .filter($"jw" >= 960000L)
    val labels = graft.dedup.Dedup
      .connectedComponents(pairs, "ra", "rb")
      .select($"__id".as("rid"), $"__lbl".as("root"))
    val labeled = recs.join(labels, Seq("rid"), "left")
      .select($"rid", $"name", coalesce($"root", $"rid").as("entity_id"))
    val g = labeled.groupBy($"entity_id")
      .agg(count(lit(1)).as("n_members"),
        sum(when($"rid" >= 1000000000L, 1L).otherwise(0L)).as("n_aliases"))
    g.join(labeled.select($"rid", $"name"), g("entity_id") === col("rid"))
      .select($"entity_id", $"n_members", $"n_aliases",
        $"name".as("canonical_name"))
      .orderBy($"entity_id")
  }
  private val q331Sql =
    """WITH RECURSIVE base AS (SELECT c_custkey, c_name FROM customer),
      |al AS (SELECT c_custkey + 1000000000 AS rid,
      |    substr(c_name, 1, 8 + c_custkey % 7)
      |      || substr(c_name, 10 + c_custkey % 7) AS name
      |  FROM base WHERE c_custkey % 13 = 0),
      |recs AS (SELECT c_custkey AS rid, c_name AS name FROM base
      |  UNION ALL SELECT rid, name FROM al),
      |rb AS (SELECT rid, name,
      |    substr(name, length(name) - 2, 3) AS blk FROM recs),
      |pr AS (SELECT a.rid AS ra, b.rid AS rb2
      |  FROM rb a JOIN rb b ON a.blk = b.blk AND a.rid < b.rid
      |    AND length(a.name) <> length(b.name)
      |    AND CAST(round(jaro_winkler_similarity(a.name, b.name) * 1000000)
      |      AS BIGINT) >= 960000),
      |edges AS (SELECT ra AS s, rb2 AS d FROM pr
      |  UNION SELECT rb2, ra FROM pr),
      |reach AS (
      |  SELECT s AS id, s AS r FROM edges
      |  UNION
      |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s),
      |lab AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
      |fl AS (SELECT rb.rid, rb.name, coalesce(lab.root, rb.rid) AS entity_id
      |  FROM rb LEFT JOIN lab ON rb.rid = lab.id),
      |g AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
      |    CAST(sum(CASE WHEN rid >= 1000000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_aliases
      |  FROM fl GROUP BY 1)
      |SELECT g.entity_id, g.n_members, g.n_aliases,
      |  f2.name AS canonical_name
      |FROM g JOIN fl f2 ON f2.rid = g.entity_id
      |ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q86_fuzzy_name_join", q86, Some(q86Sql)),
    QueryDef("q87_bloom_pruned_join", q87, Some(q87Sql)),
    QueryDef("q306_jw_best_match", q306, Some(q306Sql)),
    QueryDef("q331_entity_resolution", q331, Some(q331Sql)),
  )
}
