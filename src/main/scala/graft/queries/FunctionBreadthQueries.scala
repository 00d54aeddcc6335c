package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Function-surface breadth beyond the reference's minimal scalar library:
  * the full ranking-window family, string functions (including edit
  * distance — useful for typo-level dedup), and array / higher-order
  * functions. All per-row or single-shuffle shapes.
  */
object FunctionBreadthQueries extends QueryModule {

  /** q47: ranking-window family — rank, dense_rank, ntile, lead,
    * first/last_value, cume_dist over one shared sort (Catalyst collapses
    * same-spec windows into one Window node). */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".desc, $"o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter($"o_custkey" <= 100)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        lead($"o_orderkey", 1).over(w).as("next_okey"),
        first($"o_orderkey").over(wf).as("top_okey"),
        last($"o_orderkey").over(wf).as("bottom_okey"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy($"o_orderstatus", $"rnk", $"o_orderkey")
  }
  private val q47Sql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  LEAD(o_orderkey) OVER w AS next_okey,
      |  FIRST_VALUE(o_orderkey) OVER wf AS top_okey,
      |  LAST_VALUE(o_orderkey) OVER wf AS bottom_okey,
      |  round(CUME_DIST() OVER w, 6) AS cd
      |FROM orders
      |WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey),
      |  wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin

  /** q48: string-function surface — pad/trim/translate/split_part/replace/
    * position/reverse, plus levenshtein distance to a fixed probe (the
    * edit-distance primitive behind typo-level near-dup). */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_partkey" <= 500)
      .select($"p_partkey",
        lpad($"p_brand", 12, "*").as("brand_pad"),
        rtrim(rpad($"p_type", 30, " ")).as("type_rtrim"),
        translate($"p_name", "aeiou", "AEIOU").as("name_vowels"),
        expr("split_part(p_type, ' ', 1)").as("type_first"),
        regexp_replace($"p_name", "\\s+", "_").as("name_snake"),
        instr($"p_type", "BRASS").as("brass_pos"),
        reverse($"p_brand").as("brand_rev"),
        levenshtein($"p_brand", lit("Brand#33")).as("edit_to_b33"))
      .orderBy($"p_partkey")
  }
  private val q48Sql =
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  rtrim(rpad(p_type, 30, ' ')) AS type_rtrim,
      |  translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
      |  split_part(p_type, ' ', 1) AS type_first,
      |  regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
      |  CAST(instr(p_type, 'BRASS') AS INT) AS brass_pos,
      |  reverse(p_brand) AS brand_rev,
      |  levenshtein(p_brand, 'Brand#33') AS edit_to_b33
      |FROM part WHERE p_partkey <= 500
      |ORDER BY p_partkey""".stripMargin

  /** q49: array / higher-order surface — split, slice, sort, distinct,
    * filter, transform, reduce, flatten, contains, zip-free fold — over the
    * document token arrays. Everything stays in one projection. */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        size($"toks").as("n_toks"),
        size(array_distinct($"toks")).as("n_uniq"),
        expr("size(filter(toks, t -> length(t) > 4))").as("n_long"),
        expr("array_join(slice(array_sort(array_distinct(toks)), 1, 3), ',')").as("first3_sorted"),
        expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)").as("total_len"),
        array_contains($"toks", "spark").cast("int").as("has_spark"),
        expr("array_position(toks, 'data')").as("data_pos"))
      .orderBy($"doc_id")
  }
  private val q49Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  len(toks) AS n_toks,
      |  len(list_distinct(toks)) AS n_uniq,
      |  len(list_filter(toks, t -> len(t) > 4)) AS n_long,
      |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
      |  list_reduce(list_prepend(0, list_transform(toks, t -> len(t))), (a, x) -> a + x) AS total_len,
      |  CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
      |  CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS data_pos
      |FROM t ORDER BY doc_id""".stripMargin

  /** q101: unpivot (melt) — the inverse of q20's pivot: a wide per-flag
    * aggregate row turned into (key, metric, value) long form via the
    * native `Dataset.unpivot` (Catalyst `Expand`, one pass, no join or
    * shuffle beyond the feeding aggregate; output is 3× the input rows by
    * construction, never data-dependent). Metrics are rounded before
    * melting so the shared DOUBLE value column is engine-stable. */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(sum($"l_quantity".cast("decimal(28,10)")).cast("double"), 2).as("sum_qty"),
        round(sum($"l_extendedprice".cast("decimal(38,8)")).cast("double"), 2).as("sum_price"),
        round(sum($"l_discount".cast("decimal(28,10)")).cast("double") /
          count(lit(1)), 6).as("avg_disc"))
    wide.unpivot(
        ids = Array($"l_returnflag"),
        values = Array($"sum_qty", $"sum_price", $"avg_disc"),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy($"l_returnflag", $"metric")
  }
  private val q101Sql =
    """WITH wide AS (SELECT l_returnflag,
      |    round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
      |    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 2) AS sum_price,
      |    round(CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE)
      |      / count(*), 6) AS avg_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
      |UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
      |ORDER BY l_returnflag, metric""".stripMargin

  /** q163: positional window values over the FULL partition frame —
    * nth_value(2) (null when the partition has one row), first_value,
    * last_value, collapsed to one row per customer via rn = 1. One
    * shuffle on the partition key; the full-frame functions and the
    * ranking share the single per-partition sort (Catalyst collapses
    * same-spec windows, q47's property). Values are carried untouched
    * (no arithmetic), so parity is value-movement-exact. */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_orders", count(lit(1)).over(full))
      .withColumn("first_price", first($"o_totalprice").over(full))
      .withColumn("second_price", nth_value($"o_totalprice", 2).over(full))
      .withColumn("last_price", last($"o_totalprice").over(full))
      .where($"rn" === 1)
      .select($"o_custkey", $"n_orders", $"first_price",
        $"second_price", $"last_price")
      .orderBy($"o_custkey")
  }
  private val q163Sql =
    """WITH w AS (SELECT o_custkey,
      |    row_number() OVER win AS rn,
      |    CAST(count(*) OVER winf AS BIGINT) AS n_orders,
      |    first_value(o_totalprice) OVER winf AS first_price,
      |    nth_value(o_totalprice, 2) OVER winf AS second_price,
      |    last_value(o_totalprice) OVER winf AS last_price
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    winf AS (win ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT o_custkey, n_orders, first_price, second_price, last_price
      |FROM w WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** q164: union-by-name with missing columns — schema-evolution union
    * (`unionByName(allowMissingColumns = true)`): two summaries with
    * overlapping but unequal column sets stack by NAME, absent columns
    * NULL-fill (positional UNION would mis-zip them; q09 covers that
    * form). Values are counts/min/max only — pure value movement, no
    * order-dependent arithmetic. */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir)
      .groupBy($"o_orderstatus".as("grp"))
      .agg(count(lit(1)).as("n"), max($"o_totalprice").as("max_price"))
      .withColumn("src", lit("orders"))
    val b = Tables.customer(s, dir)
      .groupBy($"c_mktsegment".as("grp"))
      .agg(count(lit(1)).as("n"), min($"c_acctbal").as("min_acctbal"))
      .withColumn("src", lit("customers"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy($"src", $"grp")
  }
  private val q164Sql =
    """SELECT * FROM (
      |  SELECT o_orderstatus AS grp, CAST(count(*) AS BIGINT) AS n,
      |    max(o_totalprice) AS max_price, 'orders' AS src
      |  FROM orders GROUP BY 1
      |  UNION ALL BY NAME
      |  SELECT c_mktsegment AS grp, CAST(count(*) AS BIGINT) AS n,
      |    min(c_acctbal) AS min_acctbal, 'customers' AS src
      |  FROM customer GROUP BY 1)
      |ORDER BY src, grp""".stripMargin

  /** q165: regular-expression function family — non-overlapping match
    * counting, replace-all, and first-group extraction (both engines
    * return the EMPTY STRING, not NULL, on a no-match extract — the gate
    * pins that edge). Pure per-row projections compiled once per task:
    * embarrassingly parallel, no shuffle before the final order. */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        regexp_count($"text", lit("[aeiou]{2}")).cast("long").as("n_vowel_pairs"),
        length(regexp_replace($"text", "data", "DATA")).cast("long").as("rep_len"),
        regexp_extract($"text", "(s\\w+)", 1).as("first_s_word"))
      .orderBy($"doc_id")
  }
  private val q165Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT) AS n_vowel_pairs,
      |  CAST(len(regexp_replace(text, 'data', 'DATA', 'g')) AS BIGINT) AS rep_len,
      |  regexp_extract(text, '(s\w+)', 1) AS first_s_word
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q174: explicit NULL placement in ordering under LIMIT. The engines'
    * DEFAULTS disagree (Spark: NULLS FIRST on ASC; DuckDB: NULLS LAST),
    * so any top-k over a nullable key silently diverges unless the query
    * pins placement — this gate pins NULLS FIRST plus a unique tie-break
    * and proves the surviving LIMIT set matches. The nullable key is
    * derived with nullif (also part of the gated surface). */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // nulls are made RARE (1-in-1553 order keys) so at the gate scale
    // the LIMIT set straddles the null/non-null boundary instead of
    // being all-null filler
    Tables.orders(s, dir)
      .select($"o_orderkey",
        when($"o_orderkey" % 1553 === 0, lit(null).cast("string"))
          .otherwise($"o_orderstatus").as("status_or_null"),
        nullif($"o_orderstatus", lit("P")).as("status_no_p"),
        $"o_totalprice")
      .orderBy($"status_or_null".asc_nulls_first, $"o_orderkey".asc)
      .limit(25)
  }
  private val q174Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 1553 = 0 THEN NULL ELSE o_orderstatus END AS status_or_null,
      |  nullif(o_orderstatus, 'P') AS status_no_p,
      |  o_totalprice
      |FROM orders
      |ORDER BY status_or_null ASC NULLS FIRST, o_orderkey ASC LIMIT 25""".stripMargin

  /** q175: case-insensitive pattern matching — ILIKE (with a literal '%'
    * escape-free pattern) against its case-sensitive LIKE sibling, counted
    * side by side per brand so the gate fails if either collation behavior
    * drifts. p_type values are upper-case single words ('PROMO'), so
    * the lower-case ILIKE pattern matches only through case folding while
    * LIKE with the same pattern matches nothing — the asymmetry is the
    * check. */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .groupBy($"p_brand")
      .agg(
        sum(when($"p_type".ilike("%prom%"), 1L).otherwise(0L)).as("n_ilike"),
        sum(when($"p_type".like("%prom%"), 1L).otherwise(0L)).as("n_like_lower"),
        sum(when($"p_type".like("%PROM%"), 1L).otherwise(0L)).as("n_like_upper"),
        count(lit(1)).as("n_parts"))
      .orderBy($"p_brand")
  }
  private val q175Sql =
    """SELECT p_brand,
      |  CAST(sum(CASE WHEN p_type ILIKE '%prom%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ilike,
      |  CAST(sum(CASE WHEN p_type LIKE '%prom%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like_lower,
      |  CAST(sum(CASE WHEN p_type LIKE '%PROM%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like_upper,
      |  CAST(count(*) AS BIGINT) AS n_parts
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q197: positional explode — `posexplode` must yield the element's
    * ordinal (0-based), gated by recomputing first-occurrence positions a
    * second way: the oracle never explodes, it asks `list_position`
    * (1-based, first match) for the same answer. A generator that
    * shuffled, deduplicated, or mis-numbered elements moves first_pos or
    * n_occ. Shape: generate → filter to a fixed probe vocabulary →
    * re-aggregate; the explode inflates rows only between two pipelined
    * stages, nothing wide materializes. */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .filter($"tok".isin("spark", "data", "merge", "window"))
      .groupBy($"doc_id", $"tok")
      .agg(min($"pos").cast("long").as("first_pos"), count(lit(1)).as("n_occ"))
      .orderBy($"doc_id", $"tok")
  }
  private val q197Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id, tok,
      |  CAST(list_position(toks, tok) - 1 AS BIGINT) AS first_pos,
      |  CAST(len(list_filter(toks, s -> s = tok)) AS BIGINT) AS n_occ
      |FROM t, (VALUES ('spark'), ('data'), ('merge'), ('window')) v(tok)
      |WHERE list_contains(toks, tok)
      |ORDER BY doc_id, tok""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q47_window_ranking", q47, Some(q47Sql)),
    QueryDef("q48_string_functions", q48, Some(q48Sql)),
    QueryDef("q49_array_functions", q49, Some(q49Sql)),
    QueryDef("q101_unpivot", q101, Some(q101Sql)),
    QueryDef("q163_positional_window", q163, Some(q163Sql)),
    QueryDef("q164_union_by_name", q164, Some(q164Sql)),
    QueryDef("q165_regexp_family", q165, Some(q165Sql)),
    QueryDef("q174_null_ordering", q174, Some(q174Sql)),
    QueryDef("q175_ilike", q175, Some(q175Sql)),
    QueryDef("q197_posexplode_firstpos", q197, Some(q197Sql)),
  )
}
