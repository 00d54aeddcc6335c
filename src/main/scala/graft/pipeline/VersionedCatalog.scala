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
  * Writers never mutate a published directory: a publish writes fresh
  * `v<N>` dirs for every table in the batch, writes commit manifest `C`,
  * then points `_latest` at it via write-temp + atomic rename. A reader
  * resolves `_latest` ONCE and reads every table from that commit's
  * manifest, so it can never observe table A from one publish and table B
  * from another (the medallion failure mode where gold features and the
  * DQ table disagree mid-refresh). A crash before the pointer flip leaves
  * orphan version dirs — invisible to readers, reclaimed by `vacuum`.
  *
  * At 100 TB the manifest records files, not directories, and the pointer
  * lives in a CAS-capable store (object-store conditional put, a catalog
  * service); the commit shape — immutable data, tiny manifest, one atomic
  * pointer — is exactly this one.
  */
final class VersionedCatalog(spark: SparkSession, warehouseDir: String) {

  private def commitsDir = new java.io.File(warehouseDir, "_commits")
  private def latestFile = new java.io.File(commitsDir, "_latest")

  /** Test seam: invoked after version dirs are written but before the
    * pointer flip — the publish-crash window. */
  private[pipeline] var crashHook: () => Unit = () => ()

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
    * their current version. */
  def publish(batch: Map[String, DataFrame]): Long = {
    commitsDir.mkdirs()
    val prev = currentCommit()
    val carried: Map[String, Long] = if (prev < 0) Map.empty else manifest(prev)
    val next = prev + 1
    val written = batch.map { case (table, df) =>
      val v = carried.getOrElse(table, -1L) + 1
      df.write.mode("overwrite").parquet(s"$warehouseDir/$table/v$v")
      table -> v
    }
    val lines = (carried ++ written).toSeq.sorted
      .map { case (t, v) => s"$t:$v" }.mkString("\n")
    java.nio.file.Files.write(
      new java.io.File(commitsDir, s"$next.json").toPath, lines.getBytes)
    crashHook() // crash here: manifest exists but pointer still says prev
    val tmp = new java.io.File(commitsDir, s"_latest.tmp$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes)
    java.nio.file.Files.move(tmp.toPath, latestFile.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
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
      if (v.forall(_.isDigit) && !live.contains((t.getName, v.toLong)))
        delete(vdir)
    }
    for (f <- commitsDir.listFiles()
         if f.getName.endsWith(".json")
           && !keepCommits.contains(f.getName.stripSuffix(".json").toLong))
      delete(f)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists() && !f.delete()) throw new java.io.IOException(s"cannot delete $f")
  }
}
