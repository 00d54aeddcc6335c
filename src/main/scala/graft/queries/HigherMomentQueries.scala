package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Higher-moment statistics and digit-law auditing — the tails of the
  * stats surface: skewness/kurtosis (3rd/4th standardized moments) and
  * Benford's-law leading-digit screening for financial figures.
  */
object HigherMomentQueries extends QueryModule {

  /** q139: per-group skewness and excess kurtosis. The built-in `skewness`
    * / `kurtosis` aggregates stream central-moment updates whose merge
    * order varies with partitioning — not reproducible cross-engine at the
    * ulp — so the moments assemble from exact DECIMAL power sums
    * (Σx, Σx², Σx³, Σx⁴; order-independent) and the standardized moments
    * are one per-group double formula over them:
    * m_k = Σ(x^k)/n central-ized via the binomial expansion. Population
    * (biased) form, matching what the raw-moment identity gives both
    * engines identically. x ≤ 1e5 so x⁴ ≤ 1e20 at 8 dp — DECIMAL(38,8)
    * holds it with room for 10¹⁰ rows per group. */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = Tables.orders(s, dir)
      .select($"o_orderpriority".as("g"), $"o_totalprice".as("x"))
      .groupBy($"g")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum($"x".cast("decimal(38,8)")).cast("double").as("s1"),
        sum(($"x" * $"x").cast("decimal(38,8)")).cast("double").as("s2"),
        sum(($"x" * $"x" * $"x").cast("decimal(38,8)")).cast("double").as("s3"),
        sum(($"x" * $"x" * $"x" * $"x").cast("decimal(38,8)")).cast("double").as("s4"))
    val m1 = $"s1" / $"n"
    val m2 = $"s2" / $"n" - m1 * m1
    val m3 = $"s3" / $"n" - lit(3.0) * m1 * ($"s2" / $"n") + lit(2.0) * m1 * m1 * m1
    val m4 = $"s4" / $"n" - lit(4.0) * m1 * ($"s3" / $"n") +
      lit(6.0) * m1 * m1 * ($"s2" / $"n") - lit(3.0) * m1 * m1 * m1 * m1
    m.select($"g", $"n".cast("long").as("n"),
        round(m1, 4).as("mean"),
        when(m2 > 0.0, round(m3 / sqrt(m2 * m2 * m2), 6)).as("skewness"),
        when(m2 > 0.0, round(m4 / (m2 * m2) - 3.0, 6)).as("excess_kurtosis"))
      .orderBy($"g")
  }
  private val q139Sql =
    """WITH m AS (SELECT o_orderpriority AS g,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(o_totalprice * o_totalprice * o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(o_totalprice * o_totalprice * o_totalprice * o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS s4
      |  FROM orders GROUP BY 1),
      |k AS (SELECT g, n, s1 / n AS m1,
      |    s2 / n - (s1 / n) * (s1 / n) AS m2,
      |    s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
      |    s4 / n - 4.0 * (s1 / n) * (s3 / n)
      |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
      |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      |  FROM m)
      |SELECT g, CAST(n AS BIGINT) AS n, round(m1, 4) AS mean,
      |  CASE WHEN m2 > 0.0 THEN round(m3 / sqrt(m2 * m2 * m2), 6) END AS skewness,
      |  CASE WHEN m2 > 0.0 THEN round(m4 / (m2 * m2) - 3.0, 6) END AS excess_kurtosis
      |FROM k ORDER BY g""".stripMargin

  /** q140: Benford's-law leading-digit audit over order values — the
    * financial-forensics screen: natural multi-magnitude figures should
    * have leading digit d with probability log10(1+1/d). Digit extraction
    * is string-based (first character of the non-negative value's integer
    * part — pure and identical in both engines, no float log); expected
    * shares are CONSTANT literals, so the only cross-engine surface is
    * exact counts and one per-row double division. Output includes each
    * digit's |observed − expected| deviation in basis points. */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digits = Tables.orders(s, dir)
      .filter($"o_totalprice" >= 1.0)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum($"n_obs").as("n_tot"))
      .withColumn("one", pmod($"n_tot", lit(1L)))
    digits.withColumn("one", pmod($"n_obs", lit(1L)))
      .join(broadcast(total), "one")
      .select($"digit", $"n_obs",
        round($"n_obs".cast("double") / $"n_tot".cast("double"), 6).as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / $"digit".cast("double")), 6).as("benford_share"),
        round(abs($"n_obs".cast("double") / $"n_tot".cast("double") -
          log10(lit(1.0) + lit(1.0) / $"digit".cast("double"))) * 10000.0, 2)
          .as("abs_dev_bp"))
      .orderBy($"digit")
  }
  private val q140Sql =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders WHERE o_totalprice >= 1.0),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM c)
      |SELECT digit, n_obs,
      |  round(CAST(n_obs AS DOUBLE) / n_tot, 6) AS obs_share,
      |  round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
      |  round(abs(CAST(n_obs AS DOUBLE) / n_tot - log10(1.0 + 1.0 / digit)) * 10000.0, 2)
      |    AS abs_dev_bp
      |FROM c, t ORDER BY digit""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q139_higher_moments", q139, Some(q139Sql)),
    QueryDef("q140_benford_digits", q140, Some(q140Sql)),
  )
}
