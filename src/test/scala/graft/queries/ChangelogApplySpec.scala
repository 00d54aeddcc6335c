package graft.queries

import graft.{SparkEntry, SparkTestBase}
import java.sql.Timestamp

/** Tombstone-semantics handchecks for q224 (CDC changelog apply): a
  * delete wipes, pre-delete columns never leak into re-inserted rows,
  * last-op-is-delete means no row. */
class ChangelogApplySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtures: String = {
    val dir = tmpDir("changelog")
    def ev(id: Long, u: Long, typ: String, v: Double, k: String) =
      (id, Timestamp.valueOf(s"2024-01-01 00:00:0${id % 10}"), u, typ, v, s"""{"k": $k}""")
    Seq(
      // user 1: I(plan 5) U(20) D I(plan 7) — amount from before the D
      // must NOT survive; plan must be 7, amount NULL
      ev(1, 1, "signup", 0.0, "5"),
      ev(2, 1, "purchase", 20.0, "0"),
      ev(3, 1, "error", 0.0, "0"),
      ev(4, 1, "signup", 0.0, "7"),
      // user 2: I U — plain state, amount 30
      ev(5, 2, "signup", 0.0, "9"),
      ev(6, 2, "click", 30.0, "0"),
      // user 3: I U D — last op is a tombstone: NO row
      ev(7, 3, "signup", 0.0, "1"),
      ev(8, 3, "purchase", 40.0, "0"),
      ev(9, 3, "error", 0.0, "0"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q224: tombstone wipes, re-insert starts clean, trailing delete erases") {
    val got = SparkEntry.queries("q224_changelog_apply")(spark, fixtures)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("plan")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("amount")).map(_.toDouble)))
      .toMap
    assert(got.keySet == Set(1L, 2L), s"user 3 ended deleted: $got")
    assert(got(1L) == (Some(7L), None), s"pre-delete amount leaked: ${got(1L)}")
    assert(got(2L) == (Some(9L), Some(30.0)))
  }
}
