package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format round-trip fidelity gates: the ingest surfaces the spec
  * suite exercises structurally (header CSV via `BronzeIngest`, JSON) are
  * here gated on CONTENT — write the documents corpus out through the
  * format, read it back with schema inference, and hash-compare an
  * aggregate that any quoting/escaping/type-coercion bug would corrupt.
  * The staged text embeds the format's own metacharacters (commas,
  * double quotes, backslashes, braces), so the writer's quoting and the
  * reader's unquoting are both in the hash path — the class of silent
  * corruption a structural "it reads" spec cannot see. The DuckDB oracle
  * computes the same aggregate from the parquet table directly: equality
  * proves the round trip lossless.
  *
  * Scale shape: both gates are scan → per-row projection → one grouped
  * aggregate; the staging write/read is format-parallel (one file here,
  * many shards at scale — CSV stays splittable because fields embed no
  * newlines, the multiLine trap documented below). Checksums are
  * integer-exact (md5 nibble arithmetic), never float.
  */
object SourceFormatQueries extends QueryModule {

  /** First 8 md5 hex digits as a long — per-row content checksum whose
    * SUM is order-independent and engine-exact. */
  private def md5Head(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def duckMd5Head(expr: String): String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5($expr), $i, 1)) - 1)"
    (1 to 8).map(i => s"CAST(${digit(i)} AS BIGINT) * ${java.lang.Long.toString(1L << (4 * (8 - i)))}")
      .mkString("(", " + ", ")")
  }

  /** The adversarial payload: text plus every metacharacter the format
    * must quote. Kept identical in the Spark staging and the oracle. */
  private val advSql =
    """'c,'' "q" \ {j:1}|' || text"""
  private def advCol = concat(lit("c,' \"q\" \\ {j:1}|"), col("text"))

  /** q342: CSV round trip — write (header, quoted) → read (header +
    * inferSchema) → per-source count / n_chars sum / text checksum.
    * Embedded newlines are deliberately NOT staged: they would force
    * multiLine=true which makes CSV files unsplittable (one task per
    * file at 100 TB) — the documented ingest contract is
    * newline-sanitized fields, enforced loudly here. */
  private def q342(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", advCol.as("payload"), $"source", $"n_chars")
      // loud multiLine-trap guard, folded INTO the write projection: an
      // embedded newline aborts the staging write itself (no separate
      // guard scan — the pre-r13 `require(filter...isEmpty)` cost a full
      // extra pass of documents per run)
      .withColumn("payload", when($"payload".contains("\n"),
        raise_error(lit("q342: CSV staging requires newline-free fields " +
          "(multiLine trap)"))).otherwise($"payload"))
    graft.pipeline.Staging.withStagedDir("graft_q342_") { staged =>
      docs.write.mode("overwrite").option("header", "true").csv(staged)
      val back = s.read.option("header", "true")
        .option("inferSchema", "true").csv(staged)
      back.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"),
          sum(md5Head($"payload")).as("payload_checksum"))
        .orderBy($"source")
        .localCheckpoint(true) // pin before the staging disappears
    }
  }
  private val q342Sql =
    s"""WITH d AS (SELECT $advSql AS payload, source, n_chars FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(${duckMd5Head("payload")}) AS BIGINT) AS payload_checksum
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** q343: JSON-lines round trip — the same contract through the JSONL
    * writer/reader (schema inference on read), where the quoting
    * hazards are double quotes, backslashes and braces inside string
    * fields. JSONL stays line-splittable by construction. */
  private def q343(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", advCol.as("payload"), $"source", $"n_chars")
    graft.pipeline.Staging.withStagedDir("graft_q343_") { staged =>
      docs.write.mode("overwrite").json(staged)
      s.read.json(staged).groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"),
          sum(md5Head($"payload")).as("payload_checksum"),
          min($"doc_id").cast("long").as("min_doc"),
          max($"doc_id").cast("long").as("max_doc"))
        .orderBy($"source")
        .localCheckpoint(true)
    }
  }
  private val q343Sql =
    s"""WITH d AS (SELECT doc_id, $advSql AS payload, source, n_chars
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(${duckMd5Head("payload")}) AS BIGINT) AS payload_checksum,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** q356: ORC round trip — the content-fidelity contract through the
    * native ORC writer/reader (orc-core ships with the Spark jars; with
    * CSV, JSONL and parquet this closes the format surface the runtime
    * actually supports — spark-avro is absent, so Avro is out of scope
    * like Delta). ORC is typed, so nothing is inferred on read: the gate
    * certifies the writer/reader preserve string BYTES through ORC's
    * dictionary/RLE encodings (the metacharacter payload checksum), a
    * typed DECIMAL(18,2) column with its scale, and a DATE column —
    * and the read-back carries a pushed doc_id predicate so the ORC
    * reader's stripe-stats skipping path is exercised in the hash path.
    *
    * Scale shape: identical to q342/q343 — scan → projection → format
    * write → read → one grouped checksum aggregate; ORC is splittable
    * by stripe, so the staged read parallelizes at 100 TB. */
  private def q356(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", advCol.as("payload"), $"source", $"n_chars",
        ($"n_chars" * 3).cast("decimal(18,2)").as("score"),
        date_add(to_date(lit("1992-01-01")),
          ($"n_chars" % 1000).cast("int")).as("d"))
    graft.pipeline.Staging.withStagedDir("graft_q356_") { staged =>
      docs.write.mode("overwrite").orc(staged)
      s.read.orc(staged).filter($"doc_id" >= 10)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"),
          sum(md5Head($"payload")).as("payload_checksum"),
          (sum($"score") * 100).cast("long").as("score_c"),
          min($"d").as("min_d"),
          max($"d").as("max_d"))
        .orderBy($"source")
        .localCheckpoint(true)
    }
  }
  private val q356Sql =
    s"""WITH d AS (SELECT doc_id, $advSql AS payload, source, n_chars
      |  FROM documents WHERE doc_id >= 10)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(${duckMd5Head("payload")}) AS BIGINT) AS payload_checksum,
      |  CAST(sum(CAST(n_chars * 3 AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS score_c,
      |  min(DATE '1992-01-01' + CAST(n_chars % 1000 AS INTEGER)) AS min_d,
      |  max(DATE '1992-01-01' + CAST(n_chars % 1000 AS INTEGER)) AS max_d
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** q363: cross-format fidelity MATRIX — the same typed frame staged
    * through ALL four runtime formats (CSV, JSONL, ORC, parquet), read
    * back, CANONICAL-CAST, and checksummed into one row per format, so
    * the whole type-fidelity surface is pinned in a single artifact. The
    * canonical casts are where the formats genuinely differ and are the
    * point of the gate: CSV and JSONL re-infer on read (DECIMAL(18,2)
    * comes back DOUBLE, and JSONL's DATE comes back STRING), so each
    * column is cast back to its declared type before hashing — the gate
    * asserts the CONTENT survives every format's writer/reader/inference
    * stack bit-identically once re-typed (inference loses the declared
    * type, never the value, at these magnitudes; a format that quantized
    * or re-quoted anything would shift its row's checksums). The oracle
    * computes the expected row once from the parquet table and cross
    * joins the four format names: all rows must be value-identical.
    *
    * Scale shape: four independent scan → write → read → 1-row aggregate
    * pipelines (each format-parallel/splittable, q342/q343/q356 notes),
    * then a 4-row union — nothing quadratic, nothing driver-side beyond
    * the 4 checkpointed audit rows. */
  private def q363(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", advCol.as("payload"), $"n_chars",
        ($"n_chars" * 3).cast("decimal(18,2)").as("score"),
        date_add(to_date(lit("1992-01-01")),
          ($"n_chars" % 1000).cast("int")).as("d"))
    def audit(fmt: String, back: DataFrame): DataFrame =
      back.select($"payload",
          $"n_chars".cast("long").as("n_chars"),
          $"score".cast("decimal(18,2)").as("score"),
          $"d".cast("date").as("d"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"),
          sum(md5Head($"payload")).as("payload_checksum"),
          (sum($"score") * 100).cast("long").as("score_c"),
          min($"d").as("min_d"), max($"d").as("max_d"))
        .select(lit(fmt).as("format"), col("*"))
        .localCheckpoint(true) // pin before the staging disappears
    // same multiLine-trap guard as q342, folded into the CSV branch's
    // write projection: an embedded newline would be written
    // quoted-multiline and read back (no multiLine) as split records —
    // the write aborts loudly instead, at zero extra scans
    val csvDocs = docs.withColumn("payload", when($"payload".contains("\n"),
      raise_error(lit("q363: CSV staging requires newline-free fields " +
        "(multiLine trap)"))).otherwise($"payload"))
    val staged = Seq(
      graft.pipeline.Staging.withStagedDir("graft_q363csv_") { st =>
        csvDocs.write.mode("overwrite").option("header", "true").csv(st)
        audit("csv", s.read.option("header", "true")
          .option("inferSchema", "true").csv(st))
      },
      graft.pipeline.Staging.withStagedDir("graft_q363jsonl_") { st =>
        docs.write.mode("overwrite").json(st)
        audit("jsonl", s.read.json(st))
      },
      graft.pipeline.Staging.withStagedDir("graft_q363orc_") { st =>
        docs.write.mode("overwrite").orc(st)
        audit("orc", s.read.orc(st))
      },
      graft.pipeline.Staging.withStagedDir("graft_q363parquet_") { st =>
        docs.write.mode("overwrite").parquet(st)
        audit("parquet", s.read.parquet(st))
      })
    staged.reduce(_ unionAll _).orderBy($"format")
  }
  private val q363Sql =
    s"""WITH d AS (SELECT $advSql AS payload, n_chars FROM documents),
      |agg AS (SELECT count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(${duckMd5Head("payload")}) AS BIGINT) AS payload_checksum,
      |  CAST(sum(CAST(n_chars * 3 AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS score_c,
      |  min(DATE '1992-01-01' + CAST(n_chars % 1000 AS INTEGER)) AS min_d,
      |  max(DATE '1992-01-01' + CAST(n_chars % 1000 AS INTEGER)) AS max_d
      |  FROM d)
      |SELECT f.format, a.n_docs, a.sum_chars, a.payload_checksum,
      |  a.score_c, a.min_d, a.max_d
      |FROM (VALUES ('csv'), ('jsonl'), ('orc'), ('parquet')) f(format)
      |CROSS JOIN agg a ORDER BY f.format""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q342_csv_roundtrip", q342, Some(q342Sql)),
    QueryDef("q343_jsonl_roundtrip", q343, Some(q343Sql)),
    QueryDef("q356_orc_roundtrip", q356, Some(q356Sql)),
    QueryDef("q363_format_fidelity_matrix", q363, Some(q363Sql)),
  )
}
