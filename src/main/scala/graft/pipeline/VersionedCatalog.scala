package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned catalog: immutable table versions + an atomic commit
  * pointer, giving readers snapshot isolation, multi-table atomic publish,
  * and time travel — the minimal transaction-log design (a Delta/Iceberg
  * commit protocol reduced to its load-bearing parts) on plain parquet.
  *
  * Layout:
  * {{{
  *   <wh>/<table>/v<N>/...parquet      immutable version directories
  *   <wh>/_commits/<C>.json            commit manifest: table -> version
  *   <wh>/_commits/_latest             current commit id (atomic rename)
  * }}}
  *
  * Writers never mutate a published directory: a publish stages fresh
  * data under unique `_stage_*` dirs, claims the next commit id, moves the
  * staged dirs to their immutable `v<N>` homes, writes commit manifest `C`,
  * then points `_latest` at it via write-temp + atomic rename. A reader
  * resolves `_latest` ONCE and reads every table from that commit's
  * manifest, so it can never observe table A from one publish and table B
  * from another (the medallion failure mode where gold features and the
  * DQ table disagree mid-refresh). A crash before the pointer flip leaves
  * orphan stage/version dirs — invisible to readers, reclaimed by `vacuum`.
  *
  * Concurrency is OPTIMISTIC, not last-writer-wins: each publish snapshots
  * the versions of its batch tables at start, claims its commit id with an
  * atomic create (`<C>.lock` — O_CREAT|O_EXCL, the local stand-in for an
  * object-store conditional put), and before committing re-checks that no
  * adopted commit moved any of its tables. Disjoint concurrent publishes
  * REBASE and both land, serialized by the id claim; overlapping ones
  * surface a `ConcurrentModificationException` instead of silently
  * dropping a publish from the manifest chain. A manifest that exists but
  * was never pointed at (claimant crashed in the flip window) is complete
  * by construction — data moved before the manifest write — so the next
  * publisher ROLLS IT FORWARD, adopting it as its base: exactly Delta's
  * "the log entry is the commit" rule, with `_latest` as a fast-lookup
  * pointer that only ever advances.
  *
  * At 100 TB the manifest records files, not directories, and the claim
  * lives in a CAS-capable store (object-store conditional put, a catalog
  * service); the commit shape — immutable data, tiny manifest, one atomic
  * claim, one monotonic pointer — is exactly this one.
  */
final class VersionedCatalog(spark: SparkSession, warehouseDir: String) {

  private def commitsDir = new java.io.File(warehouseDir, "_commits")
  private def latestFile = new java.io.File(commitsDir, "_latest")

  /** Test seam: invoked after the manifest is written but before the
    * pointer flip — the publish-crash window. */
  private[pipeline] var crashHook: () => Unit = () => ()

  /** Test seam: invoked after the base-version snapshot but before any
    * data is staged — the window where a concurrent publish interleaves. */
  private[pipeline] var raceHook: () => Unit = () => ()

  /** Current commit id, or -1 before the first publish. */
  def currentCommit(): Long =
    if (!latestFile.exists()) -1L
    else new String(java.nio.file.Files.readAllBytes(latestFile.toPath)).trim.toLong

  private def manifest(commit: Long): Map[String, Long] = {
    val f = new java.io.File(commitsDir, s"$commit.json")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
    // one "table:version" pair per line — no JSON lib needed
    txt.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(t, v) = l.split(":", 2); t -> v.toLong
    }.toMap
  }

  /** Atomically publish a set of tables as ONE commit: either every table
    * advances or none does. Tables absent from the batch carry forward
    * their current version. Concurrent publishes of DISJOINT table sets
    * rebase and all land; an overlapping concurrent publish raises
    * `ConcurrentModificationException` (optimistic concurrency — retry by
    * re-running the publish from fresh reads). */
  def publish(batch: Map[String, DataFrame]): Long = {
    commitsDir.mkdirs()
    // snapshot: the versions of OUR tables this publish is based on
    val startBase = rollForward(currentCommit())
    val baseVersions: Map[String, Option[Long]] = {
      val m = if (startBase < 0) Map.empty[String, Long] else manifest(startBase)
      batch.keys.map(t => t -> m.get(t)).toMap
    }
    raceHook()
    // stage data once, under unique dirs invisible to readers; versions are
    // assigned at commit time so a rebase never rewrites data
    val staged: Map[String, java.io.File] = batch.map { case (t, df) =>
      val dir = new java.io.File(s"$warehouseDir/$t",
        s"_stage_${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.mode("overwrite").parquet(dir.toString)
      t -> dir
    }
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val base = rollForward(currentCommit())
      if (base >= 0) {
        val m = manifest(base)
        val moved = batch.keys.filter(t => m.get(t) != baseVersions(t)).toSeq.sorted
        if (moved.nonEmpty) {
          staged.values.foreach(delete)
          throw new java.util.ConcurrentModificationException(
            s"publish conflicts on table(s) ${moved.mkString(", ")}: " +
              s"moved by a concurrent commit since base $startBase — retry from fresh reads")
        }
      }
      val next = base + 1
      if (claim(next)) {
        val carried: Map[String, Long] = if (base < 0) Map.empty else manifest(base)
        val written = staged.map { case (t, dir) =>
          val v = carried.getOrElse(t, -1L) + 1
          java.nio.file.Files.move(dir.toPath,
            new java.io.File(s"$warehouseDir/$t/v$v").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          t -> v
        }
        val lines = (carried ++ written).toSeq.sorted
          .map { case (t, v) => s"$t:$v" }.mkString("\n")
        val mtmp = new java.io.File(commitsDir, s"_manifest.tmp$next")
        java.nio.file.Files.write(mtmp.toPath, lines.getBytes)
        java.nio.file.Files.move(mtmp.toPath,
          new java.io.File(commitsDir, s"$next.json").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        crashHook() // crash here: manifest exists but pointer still says base
        if (rollForward(currentCommit()) <= next && currentCommit() < next) {
          val tmp = new java.io.File(commitsDir, s"_latest.tmp$next")
          java.nio.file.Files.write(tmp.toPath, next.toString.getBytes)
          java.nio.file.Files.move(tmp.toPath, latestFile.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        return next
      }
      awaitManifestOrReapLock(next)
    }
    staged.values.foreach(delete)
    throw new IllegalStateException(
      s"publish gave up after $attempts claim attempts (writer storm?)")
  }

  /** Adopt completed-but-unflipped commits: a manifest on disk IS a commit
    * (its data dirs were moved into place before it was written). */
  private def rollForward(c: Long): Long = {
    var b = c
    while (new java.io.File(commitsDir, s"${b + 1}.json").exists()) b += 1
    b
  }

  /** Atomic O_CREAT|O_EXCL claim of a commit id — the local-FS stand-in
    * for an object-store conditional put. */
  private def claim(next: Long): Boolean =
    new java.io.File(commitsDir, s"$next.lock").createNewFile()

  /** Another writer holds `next`: wait for its manifest (normal case, it
    * is mid-commit), or reap its lock if it died before writing one — the
    * manifest is written via atomic rename, so existence means complete. */
  private def awaitManifestOrReapLock(next: Long): Unit = {
    val mf = new java.io.File(commitsDir, s"$next.json")
    var i = 0
    while (!mf.exists() && i < 200) { Thread.sleep(10); i += 1 }
    if (!mf.exists())
      new java.io.File(commitsDir, s"$next.lock").delete()
  }

  /** Read `table` at the current commit (default) or a past one (time
    * travel). Reading table state is reproducible forever for any retained
    * commit — version dirs are immutable. */
  def read(table: String, asOfCommit: Long = -1L): DataFrame = {
    val c = if (asOfCommit >= 0) asOfCommit else currentCommit()
    require(c >= 0, s"no commit published yet in $warehouseDir")
    val m = manifest(c)
    val v = m.getOrElse(table,
      throw new IllegalArgumentException(s"table $table not in commit $c"))
    spark.read.parquet(s"$warehouseDir/$table/v$v")
  }

  /** Drop version directories unreachable from the last `keep` commits
    * (orphans from crashed publishes included), and their manifests. */
  def vacuum(keep: Int = 1): Unit = {
    val cur = currentCommit()
    if (cur < 0) return
    val keepCommits = (math.max(0, cur - keep + 1) to cur)
    val live: Set[(String, Long)] =
      keepCommits.flatMap(c => manifest(c).toSeq).toSet
    val tables = new java.io.File(warehouseDir).listFiles()
      .filter(f => f.isDirectory && f.getName != "_commits")
    for (t <- tables; vdir <- Option(t.listFiles()).getOrElse(Array.empty)) {
      val v = vdir.getName.stripPrefix("v")
      if (vdir.getName.startsWith("_stage_")) delete(vdir) // dead publisher
      else if (v.forall(_.isDigit) && !live.contains((t.getName, v.toLong)))
        delete(vdir)
    }
    for (f <- commitsDir.listFiles()) {
      val n = f.getName
      val id =
        if (n.endsWith(".json")) Some(n.stripSuffix(".json"))
        else if (n.endsWith(".lock")) Some(n.stripSuffix(".lock"))
        else None
      id.filter(_.forall(_.isDigit)).map(_.toLong).foreach { c =>
        // locks above cur belong to a possibly in-flight claim: keep them
        if (!keepCommits.contains(c) && c <= cur) delete(f)
      }
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists() && !f.delete()) throw new java.io.IOException(s"cannot delete $f")
  }
}
