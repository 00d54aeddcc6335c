package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling / cleaning surface a curation pipeline runs before
  * training: linear-regression aggregates (drift/trend fitting),
  * width_bucket histograms with explicit under/overflow buckets, safe
  * parsing of mixed-validity strings (TRY_CAST), and PII masking.
  *
  * All four are single-scan, partial-aggregable shapes: at 100 TB each is
  * one map-side pass plus a tiny (grouped or sliced) exchange — nothing
  * here materializes per-row state on the driver.
  */
object ProfilingQueries extends QueryModule {

  /** q166: regression-aggregate family — fit price ~ quantity per return
    * flag in ONE grouped pass (regr_* are moment sketches: each is a
    * partial-aggregable combination of Σx, Σy, Σxy, Σx², n, so the 100 TB
    * plan is a map-side partial agg + 3-row final agg, no second scan).
    * Moments are rounded coarsely enough (6 dp on O(1e2) slopes, 4 dp on
    * O(1e4) intercepts) that double accumulation-order differences cannot
    * flip the compare — same policy as q52, verified across SFs. */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        regr_count($"l_extendedprice", $"l_quantity").as("n_pairs"),
        round(regr_slope($"l_extendedprice", $"l_quantity"), 6).as("slope"),
        round(regr_intercept($"l_extendedprice", $"l_quantity"), 4).as("intercept"),
        round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
        round(regr_avgx($"l_extendedprice", $"l_quantity"), 6).as("avg_qty"),
        round(regr_avgy($"l_extendedprice", $"l_quantity"), 4).as("avg_price"))
      .orderBy($"l_returnflag")
  }
  private val q166Sql =
    """SELECT l_returnflag,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty,
      |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q167: width_bucket histogram of order totals INCLUDING the under /
    * overflow buckets (0 and n+1) that q98's in-range floor binning never
    * produces. Bucket edges end in .005 so no 2-dp money value can sit on
    * a boundary: the nearest computed ratio is ≥ 2.5e-7 from an integer,
    * far outside double-rounding reach, which keeps Spark's
    * (v-min)/(max-min)*n evaluation and the oracle's floor((v-min)/w)
    * arithmetic on the same side of every floor. */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(width_bucket($"o_totalprice", lit(50000.005), lit(450000.005), lit(20)).as("bucket"),
        $"o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        round(min($"o_totalprice"), 2).as("lo"),
        round(max($"o_totalprice"), 2).as("hi"))
      .orderBy($"bucket")
  }
  private val q167Sql =
    """SELECT CASE WHEN o_totalprice < 50000.005 THEN 0
      |            WHEN o_totalprice >= 450000.005 THEN 21
      |            ELSE CAST(FLOOR((o_totalprice - 50000.005) / 20000.0) AS BIGINT) + 1
      |       END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q168: safe parsing of a mixed-validity string column — the
    * ingest-time shape where a field is numeric for some rows and free
    * text for others. TRY_CAST yields NULL (never an exception or a
    * poisoned partition) on the text rows; the audit counts parsed vs
    * rejected and checks the parsed sum, per nation. The validity mix is
    * derived deterministically from the key so every SF exercises both
    * branches. */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("raw",
        when($"c_custkey" % 2 === 0, $"c_custkey".cast("string"))
          .otherwise($"c_name"))
      .withColumn("parsed", expr("TRY_CAST(raw AS BIGINT)"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        count($"parsed").as("n_parsed"),
        (count(lit(1)) - count($"parsed")).as("n_rejected"),
        sum($"parsed").as("parsed_sum"))
      .orderBy($"c_nationkey")
  }
  private val q168Sql =
    """SELECT c_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(parsed) AS BIGINT) AS n_parsed,
      |  CAST(count(*) - count(parsed) AS BIGINT) AS n_rejected,
      |  CAST(sum(parsed) AS BIGINT) AS parsed_sum
      |FROM (
      |  SELECT c_nationkey,
      |    TRY_CAST(CASE WHEN c_custkey % 2 = 0
      |             THEN CAST(c_custkey AS VARCHAR) ELSE c_name END AS BIGINT) AS parsed
      |  FROM customer) t
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** q169: PII masking — the pre-training scrub pass. Digit runs in the
    * id-bearing name field are masked to '#' per character
    * (format-preserving: the text around them survives, so downstream
    * parsers keep working), checked row-level on a deterministic 1-in-97
    * key slice plus a per-row count of masked characters. regexp_replace
    * replaces ALL matches on the Spark side; DuckDB needs the explicit
    * 'g' flag — pinned here. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_custkey" % 97 === 0)
      .select($"c_custkey",
        regexp_replace($"c_name", "[0-9]", "#").as("name_masked"),
        (length($"c_name") - length(regexp_replace($"c_name", "[0-9]", "")))
          .cast("long").as("n_masked"))
      .orderBy($"c_custkey")
  }
  private val q169Sql =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_masked
      |FROM customer WHERE c_custkey % 97 = 0 ORDER BY c_custkey""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q166_regr_family", q166, Some(q166Sql)),
    QueryDef("q167_width_bucket", q167, Some(q167Sql)),
    QueryDef("q168_try_cast", q168, Some(q168Sql)),
    QueryDef("q169_pii_mask", q169, Some(q169Sql)),
  )
}
