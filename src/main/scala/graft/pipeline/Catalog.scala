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
    readDirs(table, dir, Seq(dir))

  private def readDirs(table: String, basePath: String, dirs: Seq[String]): DataFrame = {
    val reader = spark.read.option("basePath", basePath)
    Schemas.of(table, names) match {
      case Some(schema) =>
        // Spark appends partition columns after the data columns even under
        // a user-specified schema; re-project to the declared DDL order so
        // readers see one stable schema regardless of physical layout.
        reader.schema(schema).parquet(dirs: _*)
          .select(schema.fieldNames.map(col): _*)
      case None => reader.parquet(dirs: _*)
    }
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
    (archivedVersions(table) ++ committedPartitionArchives(table))
      .maxOption.getOrElse(0L) + 1L
  }

  def readAsOf(table: String, asOfVersion: Long): DataFrame = {
    heal(table)
    if (committedPartitionArchives(table).nonEmpty)
      readAsOfPartitioned(table, asOfVersion)
    else {
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
  }

  /** Versioned read on the PARTITIONED upsert path: version k of every
    * partition is resolved to a directory — the live one if no commit
    * after k touched it, else the pre-image from `<table>.pv<j>` for the
    * SMALLEST j ≥ k that archived it (the partition was unchanged between
    * k and j by construction); a partition first created after k is
    * absent. One parquet read per distinct root (live + each contributing
    * archive, each with its own basePath so partition columns recover),
    * unioned by name — at most retainVersions+1 scans of METADATA, and
    * data files are shared, never copied. */
  private def readAsOfPartitioned(table: String, k: Long): DataFrame = {
    val cur = committedPartitionArchives(table).maxOption.getOrElse(0L) + 1L
    if (k == cur) readDir(table, path(table))
    else {
      require(k >= 1 && k < cur,
        s"table $table is at version $cur; version $k does not exist yet")
      val have = committedPartitionArchives(table).toSet
      val needed = (k until cur)
      require(needed.forall(have.contains),
        s"version $k of $table was pruned (retainVersions=$retainVersions): " +
          s"archives ${needed.filterNot(have.contains).mkString(",")} are gone")
      // dir -> Some(root) (contributing image) | None (absent at k)
      var m: Map[String, Option[String]] =
        partitionDirs(new java.io.File(path(table)))
          .map(d => d -> Option(path(table))).toMap
      needed.sorted(Ordering[Long].reverse).foreach { j =>
        val pv = archiveDir(table, j)
        val fresh = readLines(new java.io.File(pv, "_fresh")).toSet
        readLines(new java.io.File(pv, "_touched")).foreach { d =>
          if (new java.io.File(pv, d).exists()) m += d -> Some(pv.getPath)
          else if (fresh.contains(d)) m += d -> None
        }
      }
      // NOTE the .toSeq: collect on the Map would re-key by root and
      // silently keep ONE partition per root
      val byRoot = m.toSeq.collect { case (d, Some(root)) => (root, d) }
        .groupBy(_._1).map { case (root, ds) =>
          readDirs(table, root, ds.map(_._2).sorted.map(d => s"$root/$d"))
        }
      require(byRoot.nonEmpty, s"version $k of $table resolved to no partitions")
      byRoot.reduce(_.unionByName(_))
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
    pheal(table) // partitioned-path rollback first: it never touches a
                 // committed archive, and the swap heal below is disjoint
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
        // The staged plan reads the very files being replaced, so the
        // merge is materialized to staging first — and then PROMOTED BY
        // RENAME, never rewritten: the pre-round-14 flow re-wrote the
        // staged bytes a second time through a dynamic-partition
        // overwrite (a full extra data pass) and left no history. The
        // rename commit is the same cost as the non-partitioned swap
        // (directory moves) and makes the touched partitions' outgoing
        // images the version-N archive for free — Delta-style time
        // travel on the partitioned path (see [[commitPartitioned]]).
        val stagingDir = new java.io.File(path(table) + ".staging")
        staged.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
          .parquet(stagingDir.getPath)
        commitPartitioned(table, stagingDir)
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

  // ---- partitioned versioning (the Delta-bronze time-travel analog) ----
  //
  // The non-partitioned swap versions whole-table images; an in-place
  // dynamic-partition overwrite cannot (it mutates the live dir). The
  // partitioned upsert therefore commits BY RENAME at top-level-partition
  // granularity: the outgoing image of every touched partition directory
  // is renamed into the archive `<table>.pv<N>/<dir>` and the staged
  // replacement renamed into the live table. Untouched partitions are
  // never moved or rewritten, so version N's archive holds exactly the
  // partitions version N changed — file-granular history with zero data
  // copy, the reference's Delta MERGE history on its partitioned bronze
  // (reference notebooks/bronze/01_ingest_bronze.py:85-107) re-expressed
  // as directory generations.
  //
  // Commit protocol (every step crash-safe; [[pheal]] is the recovery):
  //   1. `_touched` (all staged partition dir names) and `_fresh` (the
  //      subset with no live pre-image) are written DURABLY into the new
  //      archive before anything moves — with them a dead writer's
  //      half-commit is mechanically reversible;
  //   2. every touched live dir renames into the archive (pre-images);
  //   3. every staged dir renames into the live table;
  //   4. `_committed` marker (atomic create) seals version N;
  //   5. archives beyond [[retainVersions]] prune.
  // A crash before 4 leaves no `_committed`: pheal restores archived
  // pre-images, deletes uncommitted fresh partitions, and drops the
  // half-archive — the table is bit-exactly at version N−1 again.
  // Because step 2 fully precedes step 3, a touched dir absent from the
  // half-archive can only be the UNMOVED original (or a fresh one listed
  // in `_fresh`), so rollback never guesses.
  private def archiveDir(table: String, n: Long) =
    new java.io.File(s"${path(table)}.pv$n")

  private def partitionArchives(table: String): Seq[Long] = {
    val prefix = s"$table.pv"
    Option(new java.io.File(warehouseDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .flatMap(f => f.getName.stripPrefix(prefix).toLongOption).toSeq
  }

  private def committedPartitionArchives(table: String): Seq[Long] =
    partitionArchives(table)
      .filter(n => new java.io.File(archiveDir(table, n), "_committed").exists())

  private def partitionDirs(root: java.io.File): Seq[String] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(_.getName).toSeq.sorted

  private def readLines(f: java.io.File): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(f.toPath))
      .linesIterator.filter(_.nonEmpty).toSeq

  private def writeLinesAtomic(f: java.io.File, lines: Seq[String]): Unit = {
    val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
    java.nio.file.Files.write(tmp.toPath, lines.mkString("\n").getBytes)
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Roll back any UNCOMMITTED partition archive (a writer that died
    * mid-[[commitPartitioned]]): restore archived pre-images, delete
    * fresh partitions the dead writer had already promoted, drop the
    * half-archive and its staging. Committed archives are immutable and
    * never touched. */
  private def pheal(table: String): Unit =
    partitionArchives(table).sorted(Ordering[Long].reverse).foreach { n =>
      val pv = archiveDir(table, n)
      if (!new java.io.File(pv, "_committed").exists()) {
        val touchedF = new java.io.File(pv, "_touched")
        if (touchedF.exists()) {
          val fresh = {
            val f = new java.io.File(pv, "_fresh")
            if (f.exists()) readLines(f).toSet else Set.empty[String]
          }
          readLines(touchedF).foreach { d =>
            val live = new java.io.File(path(table), d)
            val arch = new java.io.File(pv, d)
            if (arch.exists()) {
              // pre-image archived: whatever sits live for d is the dead
              // writer's promotion (or nothing) — replace with the original
              if (live.exists()) delete(live)
              if (!arch.renameTo(live))
                throw new java.io.IOException(
                  s"cannot roll back $table/$d from ${pv.getName}")
            } else if (fresh.contains(d)) {
              // no pre-image ever existed: drop the uncommitted partition
              if (live.exists()) delete(live)
            }
            // else: archive rename for d never ran, so (step order) no
            // promotion ran either — the live dir IS the original; keep it
          }
        }
        delete(pv)
        val staging = new java.io.File(path(table) + ".staging")
        if (staging.exists()) delete(staging)
      }
    }

  /** Steps 1-5 of the partitioned commit protocol above: `staging` holds
    * the fully-written merged content of every touched partition. */
  private def commitPartitioned(table: String, staging: java.io.File): Unit = {
    val live = new java.io.File(path(table))
    val touched = partitionDirs(staging)
    require(touched.nonEmpty,
      s"partitioned commit for $table found no partition dirs in staging")
    val n = committedPartitionArchives(table).maxOption.getOrElse(0L) + 1L
    val pv = archiveDir(table, n)
    if (!pv.mkdirs())
      throw new java.io.IOException(s"cannot create archive ${pv.getName}")
    val fresh = touched.filterNot(d => new java.io.File(live, d).exists())
    writeLinesAtomic(new java.io.File(pv, "_touched"), touched)
    writeLinesAtomic(new java.io.File(pv, "_fresh"), fresh)
    touched.foreach { d =>
      val src = new java.io.File(live, d)
      if (src.exists() && !src.renameTo(new java.io.File(pv, d)))
        throw new java.io.IOException(s"cannot archive $table/$d to ${pv.getName}")
    }
    crashHook() // worst window: pre-images aside, nothing promoted yet
    touched.foreach { d =>
      val dst = new java.io.File(live, d)
      if (dst.exists()) delete(dst) // a retried promotion after a crash
      if (!new java.io.File(staging, d).renameTo(dst))
        throw new java.io.IOException(s"cannot promote $table/$d from staging")
    }
    if (!new java.io.File(pv, "_committed").createNewFile())
      throw new java.io.IOException(s"cannot seal ${pv.getName}")
    delete(staging)
    committedPartitionArchives(table).sorted.dropRight(retainVersions)
      .foreach(v => delete(archiveDir(table, v)))
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
    // a PARTITIONED table commits through the partitioned protocol, so
    // compaction preserves per-partition history exactly like an upsert
    // (pre-images archive to pv<N>, readAsOf keeps working) — routing it
    // through the whole-table swap would write a `.v<N>` archive the
    // partitioned readAsOf dispatcher never consults, silently breaking
    // version numbering for any table that mixes upserts and compaction
    if (partitionBy.nonEmpty) commitPartitioned(table, staging)
    else swapIn(staging, table)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists() && !f.delete()) throw new java.io.IOException(s"cannot delete $f")
  }
}
