package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
final class Catalog(spark: SparkSession, warehouseDir: String) {

  def path(table: String): String = s"$warehouseDir/$table"

  def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  def read(table: String): DataFrame = Schemas.of(table) match {
    case Some(schema) => spark.read.schema(schema).parquet(path(table))
    case None => spark.read.parquet(path(table))
  }

  /** Full deterministic rewrite (reference silver/gold mode). */
  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(path(table))

  /** Append (reference DQ mode). */
  def append(df: DataFrame, table: String, partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionBy: _*).parquet(path(table))

  /** MERGE-emulation upsert on `keys` (SURVEY §7.3): incoming rows win on
    * key collision (MERGE's UPDATE-all-columns), unmatched target rows are
    * kept, new keys insert. Cost on plain parquet is a full rewrite of the
    * table image; at scale this becomes dynamic partition overwrite so only
    * partitions containing touched keys rewrite.
    */
  def upsert(incoming: DataFrame, table: String, keys: Seq[String],
             partitionBy: Seq[String]): Unit = {
    val staged =
      if (!exists(table)) incoming
      else {
        val target = read(table)
        // left_anti keeps target rows whose key is absent from the batch
        incoming.unionByName(
          target.join(incoming.select(keys.map(incoming(_)): _*).distinct(), keys, "left_anti"))
      }
    // The target is also the join input: materialize the staged image before
    // the overwrite truncates the directory it is being read from.
    val out = path(table) + ".staging"
    staged.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(out)
    val dir = new java.io.File(path(table))
    delete(dir)
    if (!new java.io.File(out).renameTo(dir))
      throw new java.io.IOException(s"staging rename failed for $table")
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists() && !f.delete()) throw new java.io.IOException(s"cannot delete $f")
  }
}
