package graft.pipeline

import graft.SparkTestBase

/** Commit-protocol guarantees: multi-table atomicity across a crashed
  * publish, snapshot isolation for time travel, carry-forward of
  * untouched tables, and vacuum reclaiming only unreachable versions. */
class VersionedCatalogSpec extends SparkTestBase {

  private def counts(cat: VersionedCatalog, asOf: Long = -1L): (Long, Long) =
    (cat.read("gold", asOf).count(), cat.read("dq", asOf).count())

  test("a crash before the pointer flip publishes NOTHING of the batch") {
    import spark.implicits._
    val cat = new VersionedCatalog(spark, tmpDir("vcat-crash"))
    cat.publish(Map(
      "gold" -> Seq((1, "a")).toDF("id", "v"),
      "dq" -> Seq((1, "PASS")).toDF("id", "status")))
    assert(counts(cat) == (1L, 1L))

    cat.crashHook = () => throw new RuntimeException("die before pointer flip")
    intercept[RuntimeException] {
      cat.publish(Map(
        "gold" -> Seq((1, "a"), (2, "b")).toDF("id", "v"),
        "dq" -> Seq((1, "PASS"), (2, "FAIL")).toDF("id", "status")))
    }
    cat.crashHook = () => ()
    // readers still see the OLD commit for BOTH tables — never a mix
    assert(cat.currentCommit() == 0L)
    assert(counts(cat) == (1L, 1L))

    // retry lands both tables together
    cat.publish(Map(
      "gold" -> Seq((1, "a"), (2, "b")).toDF("id", "v"),
      "dq" -> Seq((1, "PASS"), (2, "FAIL")).toDF("id", "status")))
    assert(counts(cat) == (2L, 2L))
  }

  test("time travel reads any retained commit; untouched tables carry forward") {
    import spark.implicits._
    val cat = new VersionedCatalog(spark, tmpDir("vcat-tt"))
    val c0 = cat.publish(Map(
      "gold" -> Seq((1, "a")).toDF("id", "v"),
      "dq" -> Seq((1, "PASS")).toDF("id", "status")))
    val c1 = cat.publish(Map( // dq untouched: carries forward
      "gold" -> Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")))
    assert(counts(cat, c0) == (1L, 1L))
    assert(counts(cat, c1) == (3L, 1L))
    assert(cat.read("dq", c1).collect().map(_.getString(1)).toSeq == Seq("PASS"))
  }

  test("vacuum reclaims unreachable versions but keeps retained commits readable") {
    import spark.implicits._
    val wh = tmpDir("vcat-vac")
    val cat = new VersionedCatalog(spark, wh)
    (1 to 4).foreach { i =>
      cat.publish(Map("gold" -> (1 to i).map(k => (k, s"v$k")).toDF("id", "v")))
    }
    cat.vacuum(keep = 2)
    val versions = new java.io.File(s"$wh/gold").listFiles().map(_.getName).sorted
    assert(versions.toSeq == Seq("v2", "v3"), s"got ${versions.toSeq}")
    assert(cat.read("gold", 2).count() == 3)
    assert(cat.read("gold").count() == 4)
    intercept[Exception](cat.read("gold", 0).count())
  }
}
