package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy matching of near-identical identifier strings
  * (the record-linkage step of any dedup/master-data pipeline). The
  * sub-quadratic shape is prefix blocking — candidates must share a
  * 15-char name prefix, so the edit-distance kernel runs per block, never
  * corpus x corpus. At 100 TB the block key widens (longer prefix, or
  * multiple redundant keys — prefix + suffix + sorted-signature — unioned)
  * to keep the largest block's quadratic kernel inside one task's budget;
  * the join stays a plain shuffle on the block key either way.
  */
object EntityResolutionQueries extends QueryModule {

  /** q86: fuzzy self-join on customer names — pairs within Levenshtein
    * distance 1 among customers sharing a 15-char prefix block,
    * canonicalized cust_a < cust_b. The distance filter runs AFTER the
    * blocking equi-join, so the planner keeps a hash join (the inequality
    * never reaches the join condition). */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Tables.customer(s, dir)
      .select($"c_custkey", $"c_name", substring($"c_name", 1, 15).as("blk"))
    b.as("a").join(b.as("b").hint("shuffle_hash"),
        $"a.blk" === $"b.blk" && $"a.c_custkey" < $"b.c_custkey")
      .filter(levenshtein($"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey".as("cust_a"), $"b.c_custkey".as("cust_b"),
        $"a.c_name".as("name_a"), $"b.c_name".as("name_b"),
        levenshtein($"a.c_name", $"b.c_name").cast("long").as("dist"))
      .orderBy($"cust_a", $"cust_b")
  }
  private val q86Sql =
    """WITH b AS (SELECT c_custkey, c_name, substr(c_name, 1, 15) AS blk FROM customer)
      |SELECT a.c_custkey AS cust_a, b2.c_custkey AS cust_b,
      |  a.c_name AS name_a, b2.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b2.c_name) AS BIGINT) AS dist
      |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.c_custkey < b2.c_custkey
      |WHERE levenshtein(a.c_name, b2.c_name) <= 1
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

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q86_fuzzy_name_join", q86, Some(q86Sql)),
    QueryDef("q87_bloom_pruned_join", q87, Some(q87Sql)),
  )
}
