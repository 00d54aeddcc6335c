package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Source/sink format breadth: CSV, JSON-lines, ORC, and parquet round-trip
  * the same frame losslessly (schema + values). */
class FormatsSpec extends SparkTestBase {

  test("csv/json/orc/parquet round-trips preserve the frame") {
    import spark.implicits._
    val df = (1 to 500).map(i =>
        (i.toLong, s"name_$i", i * 1.5, i % 2 == 0))
      .toDF("id", "name", "v", "flag")
    val base = tmpDir("formats")

    df.write.option("header", "true").csv(s"$base/c")
    df.write.json(s"$base/j")
    df.write.orc(s"$base/o")
    df.write.parquet(s"$base/p")

    val c = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$base/c")
    val j = spark.read.json(s"$base/j")
    val o = spark.read.orc(s"$base/o")
    val p = spark.read.parquet(s"$base/p")

    val want = df.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSeq
    for ((back, label) <- Seq((c, "csv"), (j, "json"), (o, "orc"), (p, "parquet"))) {
      val got = back
        .select($"id".cast("long"), $"name", $"v".cast("double"), $"flag".cast("boolean"))
        .orderBy($"id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSeq
      assert(got == want, s"$label round-trip diverged")
    }
  }
}
