package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, ceil, col, count, lit, pmod, sum, xxhash64}

/** Minimal parquet-backed catalog: one directory per table under a warehouse
  * root, Hive-style partition subdirectories.
  *
  * The reference stores Delta tables partitioned by `symbol` (facts) /
  * `layer` (DQ) — same layout here on plain parquet (no Delta jar in this
  * environment, SURVEY §7.3). Partitioning by symbol gives free partition
  * pruning for the per-symbol analyst queries; at 100 TB the facts would
  * move to (symbol-bucket, month) composite partitioning so a single hot
  * symbol cannot produce an oversized partition.
  */
final class Catalog(spark: SparkSession, warehouseDir: String,
                    names: TableNames = TableNames(),
                    retainVersions: Int = 3) {

  def path(table: String): String = s"$warehouseDir/$table"

  def exists(table: String): Boolean = {
    heal(table)
    new java.io.File(path(table)).exists()
  }

  def read(table: String): DataFrame = {
    heal(table)
    readDir(table, path(table))
  }

  private def readDir(table: String, dir: String): DataFrame =
    Schemas.of(table, names) match {
      case Some(schema) =>
        // Spark appends partition columns after the data columns even under
        // a user-specified schema; re-project to the declared DDL order so
        // readers see one stable schema regardless of physical layout.
        spark.read.schema(schema).parquet(dir)
          .select(schema.fieldNames.map(col): _*)
      case None => spark.read.parquet(dir)
    }

  /** VERSIONED READS (the Delta `VERSION AS OF` analog on the rename-aside
    * scheme): every swap-path commit (non-partitioned [[upsert]],
    * [[compact]]) archives the outgoing table image as `<table>.v<N>`
    * instead of deleting it, keeping the newest [[retainVersions]]
    * snapshots. [[version]] numbers the LIVE image; `readAsOf(t, k)` for
    * k < version reads snapshot `v<k>`, whose files are immutable from the
    * moment they are archived — a reader pinned to k is byte-stable across
    * any number of later upserts (CatalogUpsertSpec proves file-level
    * identity). Reading a pruned (or never-committed) version fails
    * loudly. In-place dynamic-partition overwrites do NOT version — file-
    * granular history needs the manifest design, which is
    * [[VersionedCatalog]]; this is the crash-safe rename-aside scheme's
    * free by-product, matching what the reference pipeline actually uses
    * Delta versions for (inspect the pre-merge image after a bad batch). */
  def version(table: String): Long = {
    heal(table)
    archivedVersions(table).maxOption.getOrElse(0L) + 1L
  }

  def readAsOf(table: String, asOfVersion: Long): DataFrame = {
    heal(table)
    val cur = archivedVersions(table).maxOption.getOrElse(0L) + 1L
    if (asOfVersion == cur) readDir(table, path(table))
    else {
      require(asOfVersion < cur,
        s"table $table is at version $cur; version $asOfVersion does not exist yet")
      val snap = new java.io.File(s"${path(table)}.v$asOfVersion")
      require(snap.exists(),
        s"version $asOfVersion of $table was pruned (retainVersions=$retainVersions) " +
          "or predates the first swap commit")
      readDir(table, snap.getPath)
    }
  }

  private def archivedVersions(table: String): Seq[Long] = {
    val prefix = s"$table.v"
    Option(new java.io.File(warehouseDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(prefix))
      .flatMap(n => n.stripPrefix(prefix).toLongOption).toSeq
  }

  /** Crash recovery for the swap: the live directory is renamed ASIDE (to
    * its archive slot `<table>.v<N>`) before staging is promoted, so a
    * crash at any point leaves a complete copy of the data on disk. A
    * missing live directory next to archived snapshots means the swap died
    * between its two renames — the HIGHEST archive is the set-aside live
    * image (the rename to `v<N>` and the promotion of staging are the only
    * two steps between which the live dir is absent): restore it and drop
    * whatever staging output the dead writer left behind. Runs on every
    * read/exists/version/upsert so an interrupted writer never needs
    * manual repair. */
  private def heal(table: String): Unit = {
    val dir = new java.io.File(path(table))
    val legacy = new java.io.File(path(table) + ".old")
    if (dir.exists()) {
      // live dir + '.old' coexisting means the '.old' is a COMPLETED
      // old-scheme swap's leftover (the pre-versioning swapIn only
      // deleted it on the NEXT swap), not a crash image. Left alone it
      // would linger forever — and if the live dir were ever lost with
      // no v<N> archives, heal would silently restore that stale
      // pre-upgrade image as live. Delete it here (every swap routes
      // through heal via version(), so the first new-scheme commit
      // retires it); after this, only a genuine old-scheme crash image
      // (live dir absent) can ever be restored from '.old'.
      if (legacy.exists()) delete(legacy)
    } else {
      // legacy set-aside name from before the versioned scheme: a
      // warehouse that crashed mid-swap under the old Catalog must heal
      // after an upgrade, not strand its data in `.old`
      val aside = archivedVersions(table).maxOption
        .map(v => new java.io.File(s"${path(table)}.v$v"))
        .orElse(Option(legacy).filter(_.exists()))
      aside.foreach { a =>
        val staging = new java.io.File(path(table) + ".staging")
        if (staging.exists()) delete(staging)
        if (!a.renameTo(dir))
          throw new java.io.IOException(s"cannot restore $table from ${a.getName}")
      }
    }
  }

  /** Test seam: invoked between the two renames of the non-partitioned
    * upsert swap — the worst possible crash point. Tests inject a throw to
    * simulate the JVM dying mid-swap. */
  private[pipeline] var crashHook: () => Unit = () => ()

  /** Full deterministic rewrite (reference silver/gold mode). */
  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(path(table))

  /** Append (reference DQ mode). */
  def append(df: DataFrame, table: String, partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionBy: _*).parquet(path(table))

  /** MERGE-emulation upsert on `keys` (SURVEY §7.3): incoming rows win on
    * key collision (MERGE's UPDATE-all-columns), unmatched target rows are
    * kept, new keys insert.
    *
    * Scale shape: when the table is partitioned, only the partitions the
    * batch touches are read, merged, and rewritten (Spark's dynamic
    * partition overwrite); a daily batch touching 4 of 10k symbol
    * partitions rewrites 4 directories, not the table. The merge input is
    * partition-pruned by an IN filter on the touched partition values, so
    * the anti-join's target side never scans cold partitions.
    */
  def upsert(incoming: DataFrame, table: String, keys: Seq[String],
             partitionBy: Seq[String]): Unit = {
    if (!exists(table)) {
      incoming.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(path(table))
      return
    }
    val pcol = partitionBy.headOption.filter(keys.contains)
    pcol match {
      case Some(p) =>
        // touched partition values: small by construction (one per symbol
        // in the batch) — collected to drive partition pruning
        val touched = incoming.select(incoming(p)).distinct().collect().map(_.get(0))
        val target = read(table).filter(col(p).isin(touched: _*))
        val staged = incoming.unionByName(
          target.join(incoming.select(keys.map(incoming(_)): _*).distinct(), keys, "left_anti"))
        // Overwrite is lazy per-partition, but the staged plan reads the
        // very files being replaced — materialize to staging first.
        val stagingDir = path(table) + ".staging"
        staged.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(stagingDir)
        spark.read.schema(staged.schema).parquet(stagingDir)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionBy: _*)
          .parquet(path(table))
        delete(new java.io.File(stagingDir))
      case None =>
        val target = read(table)
        val staged = incoming.unionByName(
          target.join(incoming.select(keys.map(incoming(_)): _*).distinct(), keys, "left_anti"))
        val staging = new java.io.File(path(table) + ".staging")
        staged.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(staging.getPath)
        swapIn(staging, table)
    }
  }

  /** Atomic-enough swap with no window where the data exists nowhere: set
    * the live directory aside INTO ITS ARCHIVE SLOT (`<table>.v<N>` — the
    * rename that used to target `.old` now IS the version archive), promote
    * staging, then prune archives beyond [[retainVersions]]. A crash
    * between any two steps leaves either the original (heal restores it
    * from the highest archive) or the fully-written new table — never a
    * lost table, which a delete-then-rename would have as its failure
    * mode. */
  private def swapIn(staging: java.io.File, table: String): Unit = {
    val dir = new java.io.File(path(table))
    val aside = new java.io.File(s"${path(table)}.v${version(table)}")
    if (!dir.renameTo(aside))
      throw new java.io.IOException(s"cannot set aside $dir for swap")
    crashHook() // a simulated crash leaves on-disk state exactly as a real one
    if (!staging.renameTo(dir)) {
      heal(table) // restore the original before failing
      throw new java.io.IOException(s"staging rename failed for $table; original restored")
    }
    archivedVersions(table).sorted.dropRight(retainVersions).foreach { v =>
      delete(new java.io.File(s"${path(table)}.v$v"))
    }
  }

  /** OPTIMIZE-style compaction: rewrite the table into
    * `ceil(rows / targetRowsPerFile)` files per partition directory,
    * preserving every row. Streaming appends and per-batch upserts accrete
    * small files until scan planning is dominated by file metadata, not
    * bytes — the operational fix is a periodic rewrite, done here through
    * the same crash-safe staging swap as the upsert, so a compaction that
    * dies mid-flight never loses the table.
    *
    * Scale shape: one sizing aggregate (per-partition row counts — one
    * output row per partition DIRECTORY, the same bounded collect as the
    * upsert's touched-partition list) and one shuffle for the rewrite.
    * Hashing on the partition columns alone would funnel each directory
    * into a single task (one oversized file, one straggler per hot
    * partition), so rows spread across each directory's file budget by a
    * hash spread key: directory layout comes from `partitionBy`, file
    * count within a directory from the spread. At 100 TB this runs
    * per-partition-predicate (compact last day's partitions), never
    * whole-table — the sizing pass then scans only what is rewritten
    * anyway. */
  def compact(table: String, partitionBy: Seq[String] = Nil,
              targetRowsPerFile: Long = 1000000L): Unit = {
    val current = read(table)
    val dataCols = current.columns.filterNot(partitionBy.contains).map(col)
    val spreadMod = (cnt: Column) =>
      ceil(cnt.cast("double") / targetRowsPerFile).cast("long")
    val reshaped =
      if (partitionBy.nonEmpty) {
        val counts = current.groupBy(partitionBy.map(col): _*)
          .agg(count(lit(1)).as("__cnt"))
        val totalFiles = math.max(1, counts
          .agg(sum(spreadMod(col("__cnt"))))
          .collect()(0).getLong(0).toInt)
        current.join(broadcast(counts), partitionBy)
          .withColumn("__spread",
            pmod(xxhash64(dataCols: _*), spreadMod(col("__cnt"))))
          .repartition(totalFiles, (partitionBy.map(col) :+ col("__spread")): _*)
          .drop("__cnt", "__spread")
      } else {
        val rows = current.count()
        current.repartition(
          math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt))
      }
    val staging = new java.io.File(path(table) + ".staging")
    reshaped.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*).parquet(staging.getPath)
    swapIn(staging, table)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists() && !f.delete()) throw new java.io.IOException(s"cannot delete $f")
  }
}
