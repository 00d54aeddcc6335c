package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.gram

/** [[org.apache.spark.sql.graft.GramMatrixLong]]: exact upper-triangle
  * Gram sums with hand-checked answers, partition invariance (integer
  * sums are order-free), and the loud inconsistent-dimension error. */
class GramAggregateSpec extends SparkTestBase {
  import spark.implicits._

  test("gram matrix of known 2-dim vectors is the exact XtX triangle") {
    // rows (1,2), (3,4): XtX = [[10, 14], [14, 20]] -> tri (10, 14, 20)
    val df = Seq(Seq(1L, 2L), Seq(3L, 4L)).toDF("qv")
    val got = df.agg(gram.gramMatrixLong($"qv")).as[Seq[Long]].head()
    assert(got === Seq(10L, 14L, 20L))
  }

  test("gram triangle indexing covers d=3 and negative components") {
    // single row (1, -2, 3): tri = (1, -2, 3, 4, -6, 9)
    val df = Seq(Seq(1L, -2L, 3L)).toDF("qv")
    val got = df.agg(gram.gramMatrixLong($"qv")).as[Seq[Long]].head()
    assert(got === Seq(1L, -2L, 3L, 4L, -6L, 9L))
  }

  test("gram matrix is bit-identical across partitionings and skips nulls") {
    val rows: Seq[Option[Seq[Long]]] =
      (1 to 100).map(i => Some(Seq(i.toLong, (i % 7).toLong, -i.toLong))) :+
        Option.empty[Seq[Long]]
    val df = rows.toDF("qv")
    val a = df.repartition(1).agg(gram.gramMatrixLong($"qv")).as[Seq[Long]].head()
    val b = df.repartition(13).agg(gram.gramMatrixLong($"qv")).as[Seq[Long]].head()
    assert(a === b)
    val s2 = (1 to 100).map(i => i.toLong * i).sum
    assert(a.head === s2, "cell (0,0) is sum of squares of the first dim")
  }

  test("inconsistent vector dims fail loudly, not silently") {
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("qv")
    val e = intercept[Exception] {
      df.repartition(1).agg(gram.gramMatrixLong($"qv")).collect()
    }
    assert(e.getMessage.contains("inconsistent vector dims") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("inconsistent vector dims"))
  }
}
