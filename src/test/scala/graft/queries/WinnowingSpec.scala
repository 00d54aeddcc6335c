package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The winnowing GUARANTEE behind q352 (Schleimer et al. 2003, thm: any
  * shared substring of length ≥ k + w − 1 yields at least one shared
  * fingerprint hash) plus the selection's structural invariants — the
  * properties the gate's per-doc digest asserts only indirectly. */
class WinnowingSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 8
  private val W = 4

  private def selections(docs: Seq[(Long, String)]) =
    TextDedupQueries.winnowSelections(docs.toDF("doc_id", "text"), K, W)
      .withColumn("h", substring($"sel", 1, 32))
      .withColumn("pos", lit(1048576) - substring($"sel", 33, 7).cast("long"))
      .select($"doc_id", $"h", $"pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("guarantee: docs sharing a >= k+w-1 substring share a fingerprint hash") {
    // 11-char shared block, embedded at different offsets in otherwise
    // unrelated texts
    val shared = "THESHAREDBL" // k + w - 1 = 11 chars
    val a = "aaaaaaaaaa" + shared + "bbbbbbbbbb"
    val b = "zzzz" + shared + "qqqqqqqqqqqqqqqq"
    val sel = selections(Seq(1L -> a, 2L -> b))
    val hA = sel.collect { case (1L, h, _) => h }.toSet
    val hB = sel.collect { case (2L, h, _) => h }.toSet
    assert((hA intersect hB).nonEmpty,
      "shared 11-char substring must yield a shared fingerprint hash")
  }

  test("coverage: every full window of gram positions contains a selection") {
    val text = "the quick brown fox jumps over the lazy dog again"
    val sel = selections(Seq(1L -> text))
    val posSet = sel.map(_._3).toSet
    val grams = text.length - K + 1
    (W to grams).foreach { end =>
      assert((end - W + 1 to end).exists(p => posSet.contains(p.toLong)),
        s"window ending at $end has no selected position")
    }
  }

  test("tie rule: identical grams in one window select the rightmost position") {
    // text of one repeated character: every gram identical, so every
    // window's min key is its rightmost row (largest pos)
    val sel = selections(Seq(1L -> ("x" * 20)))
    // grams at pos 1..13; windows end at 4..13; rightmost-tie selects the
    // window's LAST row each time -> selections are exactly pos 4..13
    assert(sel.map(_._3).sorted.toList == (4L to 13L).toList)
  }

  test("guarantee holds parametrically: second window shape (k=5, w=7)") {
    // the Schleimer guarantee is parametric in (k, w); prove the spec
    // isn't an artifact of the gate's (8, 4) choice
    val k2 = 5; val w2 = 7
    val shared = "SHAREDBLOCK" // k2 + w2 - 1 = 11 chars
    val docs = Seq(1L -> ("prefix-one-" + shared + "-tail-a"),
      2L -> ("zz-" + shared + "-something-else")).toDF("doc_id", "text")
    val sel = TextDedupQueries.winnowSelections(docs, k2, w2)
      .withColumn("h", substring($"sel", 1, 32))
      .select($"doc_id", $"h")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hA = sel.collect { case (1L, h) => h }.toSet
    val hB = sel.collect { case (2L, h) => h }.toSet
    assert((hA intersect hB).nonEmpty,
      "k+w-1 shared substring must share a fingerprint at (5,7) too")
  }

  test("guard: a doc at the 2^20 position-encoding bound fails loudly") {
    // the 7-digit (2^20 - pos) key field only orders correctly below
    // 2^20 chars; the guard must throw, not silently corrupt the keys
    val ex = intercept[Exception] {
      selections(Seq(1L -> ("y" * 1048576)))
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("2^20")),
      s"expected the winnowing length guard, got: $ex")
  }

  test("guard: a doc just under the bound passes") {
    val n = TextDedupQueries
      .winnowSelections(Seq(1L -> ("y" * 200)).toDF("doc_id", "text"), K, W)
      .count()
    assert(n > 0)
  }

  test("property: guarantee holds on random doc pairs with planted overlap") {
    val genChunk = Gen.choose(10, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val genShared = Gen.choose(K + W - 1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('A', 'B', 'C')).map(_.mkString))
    val prop = Prop.forAll(genChunk, genChunk, genChunk, genChunk, genShared) {
      (p1, s1, p2, s2, sh) =>
        val sel = selections(Seq(1L -> (p1 + sh + s1), 2L -> (p2 + sh + s2)))
        val hA = sel.collect { case (1L, h, _) => h }.toSet
        val hB = sel.collect { case (2L, h, _) => h }.toSet
        (hA intersect hB).nonEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
