package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Date

/** Physical table names for the five pipeline tables (reference
  * `config.yaml` `tables:` section). Defaults match the reference. */
final case class TableNames(
    bronze: String = "bronze_prices",
    silver: String = "silver_prices_daily",
    silverRejected: String = "silver_prices_rejected",
    gold: String = "gold_market_features_daily",
    dq: String = "data_quality_checks")

/** DQ thresholds. Defaults are the reference's notebook constants
  * (notebooks/gold/04_data_quality_checks.py:15-17); a `quality:` config
  * section overrides them — the reference hardcodes these, which its own
  * users would hit on the first symbol with different gap tolerance. */
final case class DqThresholds(
    gapDays: Int = 4,
    absReturn: Double = 0.10,
    staleDays: Int = 7)

/** Runtime configuration for the medallion pipeline — the engine's
  * equivalent of the reference's `config.yaml:1-24` (project/timezone,
  * symbols, date range, source, paths, table names), plus the DQ
  * thresholds SURVEY §7.1 called for.
  *
  * `symbols` empty means "ingest everything in the raw dir"; a start/end
  * date bounds the ingested rows (the reference passes them to its
  * fetcher; with file drops the bound applies at bronze ingest).
  */
final case class PipelineConfig(
    projectName: String = "graft",
    timezone: String = "UTC",
    symbols: Seq[String] = Nil,
    startDate: Option[Date] = None,
    endDate: Option[Date] = None,
    source: String = "stooq",
    rawInputDir: String = "",
    checkpointsDir: String = "",
    tables: TableNames = TableNames(),
    thresholds: DqThresholds = DqThresholds())

object PipelineConfig {

  def load(path: String): PipelineConfig =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  /** Parse the YAML subset the reference config actually uses: two-level
    * `section:` / `  key: value` maps and `  - item` string lists, with
    * `#` comments, quoted strings, and `null`. No external YAML dependency
    * (the build is offline by design); anything outside this shape fails
    * loudly rather than being half-read.
    */
  def parse(text: String): PipelineConfig = {
    val entries = scala.collection.mutable.Map.empty[String, String]
    val lists = scala.collection.mutable.Map.empty[String, Vector[String]]
    var section = ""
    var listKey: Option[String] = None
    var subIndent = -1 // indent of the first sub-key seen; deeper = nested

    def clean(v: String): String = {
      val t = v.trim
      if (t.startsWith("\"") || t.startsWith("'")) {
        val q = t.charAt(0)
        val end = t.indexOf(q, 1) // inline comments after the close quote drop
        if (end > 0) t.substring(1, end) else t.drop(1)
      } else t.takeWhile(_ != '#').trim
    }

    text.linesIterator.foreach { raw =>
      val line = raw.replaceAll("\\s+$", "")
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        val indent = line.takeWhile(_ == ' ').length
        if (trimmed.startsWith("- ")) {
          val key = listKey.getOrElse(
            throw new IllegalArgumentException(s"list item without a key: $line"))
          lists(key) = lists.getOrElse(key, Vector.empty) :+ clean(trimmed.drop(2))
        } else {
          if (!trimmed.contains(":"))
            throw new IllegalArgumentException(s"unparseable config line: $line")
          val Array(k, rest @ _*) = trimmed.split(":", 2)
          val value = rest.headOption.map(_.trim).getOrElse("")
          val key = k.trim
          if (indent == 0) {
            section = key; listKey = None
            if (value.nonEmpty) entries(key) = clean(value)
          } else {
            // only two levels are supported; a deeper-indented key would
            // silently be attributed to the wrong section — refuse instead
            if (subIndent < 0) subIndent = indent
            if (indent > subIndent)
              throw new IllegalArgumentException(
                s"nesting deeper than two levels is not supported: $line")
            val full = s"$section.$key"
            if (value.isEmpty || clean(value).isEmpty) listKey = Some(full)
            else { entries(full) = clean(value); listKey = None }
          }
        }
      }
    }

    def str(key: String, default: String): String =
      entries.get(key).filter(v => v.nonEmpty && v != "null").getOrElse(default)
    def opt(key: String): Option[String] =
      entries.get(key).filter(v => v.nonEmpty && v != "null")
    // A malformed date must fail loudly: silently dropping the bound would
    // ingest unbounded history while the user believes it is bounded.
    def date(key: String): Option[Date] =
      opt(key).map { v =>
        try Date.valueOf(v)
        catch { case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"config key '$key': '$v' is not a yyyy-MM-dd date")
        }
      }

    val t = TableNames()
    val d = DqThresholds()
    PipelineConfig(
      projectName = str("project.name", "graft"),
      timezone = str("project.timezone", "UTC"),
      symbols = lists.getOrElse("data.symbols", Vector.empty).toSeq,
      startDate = date("data.start_date"),
      endDate = date("data.end_date"),
      source = str("data.source", "stooq"),
      rawInputDir = str("paths.raw_input_dir", ""),
      checkpointsDir = str("paths.checkpoints_dir", ""),
      tables = TableNames(
        bronze = str("tables.bronze_prices", t.bronze),
        silver = str("tables.silver_prices_daily", t.silver),
        silverRejected = str("tables.silver_prices_rejected", t.silverRejected),
        gold = str("tables.gold_market_features_daily", t.gold),
        dq = str("tables.data_quality_checks", t.dq)),
      thresholds = DqThresholds(
        gapDays = str("quality.gap_days", d.gapDays.toString).toInt,
        absReturn = str("quality.abs_return", d.absReturn.toString).toDouble,
        staleDays = str("quality.stale_days", d.staleDays.toString).toInt))
  }
}
