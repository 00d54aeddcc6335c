package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._



/** Bucketed co-located join: the physical plan must contain no shuffle
  * exchange on either join side. */
class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "name")

    spark.sql("DROP TABLE IF EXISTS graft_b_facts")
    spark.sql("DROP TABLE IF EXISTS graft_b_dims")
    Bucketing.writeBucketed(facts, "graft_b_facts", "k", 8, Seq("k"))
    Bucketing.writeBucketed(dims, "graft_b_dims", "k", 8, Seq("k"))

    val joined = spark.sql(
      """SELECT /*+ MERGE(f) */ f.k, count(*) AS n, sum(f.v) AS sv
        |FROM graft_b_facts f JOIN graft_b_dims d ON f.k = d.k
        |GROUP BY f.k""".stripMargin)
    joined.collect() // force planning through AQE

    // stage-aware count (PlanGuards): a bare collect over the adaptive
    // plan sees NO exchanges — they hide inside LeafExecNode query
    // stages — which made this assertion vacuous until round 11.
    // Group-by is on the bucket key, so even the aggregate needs none.
    val shuffles = PlanGuards.shuffleCount(joined.queryExecution.executedPlan)
    assert(shuffles == 0,
      s"expected no shuffles, got $shuffles:\n" +
        joined.queryExecution.executedPlan)

    val out = joined.collect()
    assert(out.length == 97 && out.map(_.getAs[Long]("n")).sum == 1000L)

    spark.sql("DROP TABLE IF EXISTS graft_b_facts")
    spark.sql("DROP TABLE IF EXISTS graft_b_dims")
  }
}
