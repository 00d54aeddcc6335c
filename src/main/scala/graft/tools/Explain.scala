package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit helper: prints the formatted physical plan for the named
  * queries (or all). Usage: runMain graft.tools.Explain [names...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      println(s"\n===================== $name =====================")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
