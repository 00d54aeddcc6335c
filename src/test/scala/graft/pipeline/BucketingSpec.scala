package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

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

    val plan = joined.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the only allowed exchange is the post-aggregation one — and since we
    // group by the bucket key, even that should be absent
    val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"expected no shuffles, got:\n$finalPlan")

    val out = joined.collect()
    assert(out.length == 97 && out.map(_.getAs[Long]("n")).sum == 1000L)

    spark.sql("DROP TABLE IF EXISTS graft_b_facts")
    spark.sql("DROP TABLE IF EXISTS graft_b_dims")
  }
}
