package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** q199 boundary handcheck: cents exactly at powers of two must land in
  * the bucket they OPEN, not the one they close — the off-by-one a
  * floating log2 gets wrong when log2(2^k) rounds to k−ε.
  */
class Log2HistSpec extends SparkTestBase {
  import spark.implicits._

  test("q199 buckets power-of-two boundaries exactly") {
    val d = tmpDir("log2hist")
    // cents: 1, 2, 3, 255, 256, 257 (values in dollars)
    Seq((1L, 1L, 1L, "click", 0.01), (2L, 2L, 1L, "click", 0.02),
      (3L, 3L, 1L, "click", 0.03), (4L, 4L, 1L, "click", 2.55),
      (5L, 5L, 1L, "click", 2.56), (6L, 6L, 1L, "click", 2.57))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q199_log2_histogram")(spark, d).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("lo"), x.getAs[Long]("hi"), x.getAs[Long]("n"))).toMap
    assert(r(0L) == ((1L, 1L, 1L)))   // cents 1
    assert(r(1L) == ((2L, 3L, 2L)))   // cents 2, 3
    assert(r(7L) == ((128L, 255L, 1L))) // cents 255 closes bucket 7
    assert(r(8L) == ((256L, 511L, 2L))) // cents 256 OPENS bucket 8; 257 follows
  }
}
