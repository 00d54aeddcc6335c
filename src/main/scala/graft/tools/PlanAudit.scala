package graft.tools
import graft.{GraftSession, SparkEntry}
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString()
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"))
          .filter(_._2).map(_._1)
        if (flags.nonEmpty) println(s"AUDIT $name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    println("AUDIT done")
    spark.stop()
  }
}
