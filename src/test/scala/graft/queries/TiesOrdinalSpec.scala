package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** Handchecks for q196/q197: rank-ties membership and 0-based explode
  * ordinals, on fixtures where the interesting cases are forced.
  */
class TiesOrdinalSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private lazy val dir: String = {
    val d = tmpDir("tiesord")
    // flag A: qty 1 ×3 (rank 1), qty 2 and qty 3 ×2 each (both rank 2),
    // qty 4 ×1 (rank 4 — excluded even though only 3 DISTINCT ranks shown)
    val rows = Seq.fill(3)((1L, 1.0)) ++ Seq.fill(2)((2L, 2.0)) ++
      Seq.fill(2)((3L, 3.0)) ++ Seq((4L, 4.0))
    rows.zipWithIndex.map { case ((q, _), i) =>
      (i.toLong, q, i, q.toDouble, 100.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq((1L, "data spark data window"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q196 keeps every row tying with the k-th rank and drops past it") {
    val r = run("q196_topk_with_ties", dir).collect()
      .map(x => x.getAs[Long]("qty") -> x.getAs[Long]("rk")).toMap
    // qty 1 rank 1; qtys 2 and 3 BOTH rank 2 (tie kept); qty 4 rank 4 out
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("q197 ordinals are 0-based and first occurrence wins") {
    val r = run("q197_posexplode_firstpos", dir).collect()
      .map(x => x.getAs[String]("tok") ->
        (x.getAs[Long]("first_pos"), x.getAs[Long]("n_occ"))).toMap
    assert(r == Map("data" -> ((0L, 2L)), "spark" -> ((1L, 1L)),
      "window" -> ((3L, 1L))))
  }
}
