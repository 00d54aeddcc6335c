package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral path (funnel) analysis over the event stream: each user's
  * events collapse to one ordered initial-letter path string, and journey
  * questions become regexp tests on that string — the classic
  * sessionless funnel formulation (cf. MATCH_RECOGNIZE) that needs ONE
  * shuffle on user_id regardless of how many funnel steps are asked.
  */
object FunnelQueries extends QueryModule {

  /** q176: view→click→purchase funnel. Per user the path is built by
    * sorting (ts, initial) structs INSIDE the aggregate (array_sort after
    * collect_list — map-side combinable list, one exchange on user_id, no
    * window sort), so path construction is deterministic even under ties:
    * the initial participates in the sort key. (user_id, ts) is unique in
    * the data, so the oracle's ORDER BY ts, initial agrees. Funnel
    * membership is an ordered-subsequence regexp on the path — adding a
    * funnel step costs a regexp change, not another join or pass. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", $"ts",
        substring($"event_type", 1, 1).as("i"))
      .groupBy($"user_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, i))), x -> x.i), '')")
        .as("path"))
      .groupBy(substring($"path", 1, 1).as("first_event"))
      .agg(count(lit(1)).as("n_users"),
        // strict funnel: the three steps CONSECUTIVE (no intervening events)
        sum($"path".contains("vcp").cast("long")).as("n_strict_vcp"),
        // early funnel: ordered subsequence within the first 10 events
        sum(substring($"path", 1, 10).rlike("v.*c.*p").cast("long"))
          .as("n_early_funnel"),
        round(avg(length($"path")), 2).as("avg_path_len"))
      .orderBy($"first_event")
  }
  private val q176Sql =
    """WITH paths AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, substr(event_type, 1, 1)) AS path
      |  FROM events GROUP BY user_id)
      |SELECT substr(path, 1, 1) AS first_event,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN path LIKE '%vcp%' THEN 1 ELSE 0 END) AS BIGINT) AS n_strict_vcp,
      |  CAST(sum(CASE WHEN regexp_matches(substr(path, 1, 10), 'v.*c.*p') THEN 1 ELSE 0 END) AS BIGINT) AS n_early_funnel,
      |  round(avg(length(path)), 2) AS avg_path_len
      |FROM paths GROUP BY 1 ORDER BY 1""".stripMargin

  /** q188: last-touch revenue attribution — each purchase is credited to
    * the user's most recent PRECEDING view or click ("direct" when none),
    * then revenue rolls up per channel. The lookup is not a join: one
    * window pass per user carries the latest touch forward
    * (`last(..., ignoreNulls)` over UNBOUNDED..1 PRECEDING — the same
    * LOCF kernel as q99), so attribution costs exactly one exchange+sort
    * on user_id however long the touch history is. (ts, event_id) makes
    * the order total, so "most recent" is unambiguous under same-ts
    * ties. Money flows as LONG cents; the one division happens after the
    * exact sum. */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("touch",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"touch", lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum($"cents") / 100.0, 2).as("revenue"))
      .orderBy($"channel")
  }
  private val q188Sql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |t AS (
      |  SELECT *, last_value(CASE WHEN event_type <> 'purchase'
      |      THEN event_type END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM ev)
      |SELECT coalesce(touch, 'direct') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(sum(cents) / 100.0, 2) AS revenue
      |FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q176_funnel_paths", q176, Some(q176Sql)),
    QueryDef("q188_attribution", q188, Some(q188Sql)),
  )
}
