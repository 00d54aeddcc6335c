package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** q228 growth accounting: the two conservation laws on the gate corpus
  * plus a hand-built lifecycle fixture. */
class GrowthAccountingSpec extends SparkTestBase {
  import spark.implicits._

  test("conservation laws hold on the gate corpus") {
    val rows = SparkEntry.queries("q228_growth_accounting")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (d, (act, nw, ret, res, _)) =>
      assert(act == nw + ret + res, s"day $d: actives must decompose")
    }
    rows.sliding(2).foreach { pair =>
      if (pair.length == 2 && pair(1)._1 == pair(0)._1 + 1) {
        val (d1, (act1, _, _, _, _)) = pair(0)
        val (d2, (_, _, ret2, _, ch2)) = pair(1)
        assert(act1 == ret2 + ch2,
          s"day $d1 actives must either retain or churn on $d2")
      }
    }
  }

  test("lifecycle by hand: new, retained, resurrected, churned") {
    val dir = tmpDir("growth")
    def ev(id: Long, u: Long, day: Int) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), u, "view", 1.0, "{}")
    // user 1: days 1,2,4 (new, retained, resurrected; churns on 3 and 5)
    // user 2: day 2 only (new on 2, churns on 3)
    Seq(ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 4), ev(4, 2, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q228_growth_accounting")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned")))
      .toMap
    val d0 = got.keys.min // epoch day of 2024-01-01
    assert(got(d0) == (1L, 1L, 0L, 0L, 0L))          // u1 new
    assert(got(d0 + 1) == (2L, 1L, 1L, 0L, 0L))      // u1 retained, u2 new
    assert(got(d0 + 2) == (0L, 0L, 0L, 0L, 2L))      // both gone
    assert(got(d0 + 3) == (1L, 0L, 0L, 1L, 0L))      // u1 resurrects
    assert(got(d0 + 4) == (0L, 0L, 0L, 0L, 1L))      // trailing churn
  }
}
