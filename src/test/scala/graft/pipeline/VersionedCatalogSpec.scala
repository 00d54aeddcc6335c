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

  test("interleaved publishes of DISJOINT tables both land, serialized") {
    import spark.implicits._
    val wh = tmpDir("vcat-occ-ok")
    val cat1 = new VersionedCatalog(spark, wh)
    val cat2 = new VersionedCatalog(spark, wh)
    cat1.publish(Map(
      "gold" -> Seq((1, "a")).toDF("id", "v"),
      "dq" -> Seq((1, "PASS")).toDF("id", "status")))
    // cat2 commits dq AFTER cat1 snapshots its base but BEFORE cat1 commits
    cat1.raceHook = () =>
      cat2.publish(Map("dq" -> Seq((1, "PASS"), (2, "FAIL")).toDF("id", "status")))
    val c = cat1.publish(Map("gold" -> Seq((1, "a"), (2, "b")).toDF("id", "v")))
    cat1.raceHook = () => ()
    // cat1 rebased on cat2's commit: the final commit carries BOTH writes
    assert(c == 2L && cat1.currentCommit() == 2L)
    assert(counts(cat1) == (2L, 2L))
    // and cat2's intermediate commit is still time-travelable
    assert(counts(cat1, 1L) == (1L, 2L))
  }

  test("a conflicting concurrent write on the SAME table raises, not silently drops") {
    import spark.implicits._
    val wh = tmpDir("vcat-occ-conflict")
    val cat1 = new VersionedCatalog(spark, wh)
    val cat2 = new VersionedCatalog(spark, wh)
    cat1.publish(Map("gold" -> Seq((1, "a")).toDF("id", "v")))
    cat1.raceHook = () =>
      cat2.publish(Map("gold" -> Seq((9, "z")).toDF("id", "v")))
    val e = intercept[java.util.ConcurrentModificationException] {
      cat1.publish(Map("gold" -> Seq((1, "a"), (2, "b")).toDF("id", "v")))
    }
    cat1.raceHook = () => ()
    assert(e.getMessage.contains("gold"))
    // the concurrent winner's write is intact — nothing was dropped
    assert(cat1.currentCommit() == 1L)
    assert(cat1.read("gold").collect().map(_.getInt(0)).toSeq == Seq(9))
    // and a retried publish from fresh reads succeeds
    cat1.publish(Map("gold" -> Seq((9, "z"), (2, "b")).toDF("id", "v")))
    assert(cat1.read("gold").count() == 2L)
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
