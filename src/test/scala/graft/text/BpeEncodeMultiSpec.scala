package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Handchecks + the reference-model property behind
  * [[org.apache.spark.sql.graft.BpeEncodeMulti]]: true multi-level BPE
  * (merged token = a+b, compound rules allowed) must equal the textbook
  * best-first loop on arbitrary rule tables — including tables whose
  * later rules consume earlier rules' outputs, the case the single-level
  * encoder rejects by contract. */
class BpeEncodeMultiSpec extends SparkTestBase {
  import spark.implicits._

  private def encode(toks: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(toks)).toDF("w")
      .select(graft.functions.bpe.encodeMulti($"w", rules).as("e"))
      .collect().head.getSeq[String](0)

  /** Reference: best-first loop with concatenation merges. */
  private def bestFirst(toks: Seq[String], rules: Seq[(String, String)]): Seq[String] = {
    val rank = rules.zipWithIndex.toMap
    var cur = toks.toVector
    var done = false
    while (!done && cur.length > 1) {
      val present = cur.zip(cur.tail).flatMap(p => rank.get(p).map(_ -> p))
      if (present.isEmpty) done = true
      else {
        val (_, (a, b)) = present.minBy(_._1)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
            out += s"$a$b"; i += 2
          } else { out += cur(i); i += 1 }
        }
        cur = out.result()
      }
    }
    cur
  }

  test("multi-level chain: compound rules fire after their components") {
    // (a,b)->ab enables (ab,c)->abc — the single-level encoder cannot
    // express this table at all
    assert(encode(Seq("a", "b", "c"), Seq("a" -> "b", "ab" -> "c"))
      == Seq("abc"))
    // three levels deep
    assert(encode(Seq("a", "b", "c", "d"),
      Seq("a" -> "b", "c" -> "d", "ab" -> "cd")) == Seq("abcd"))
  }

  test("rank priority wins even when a later merge would enable more") {
    // rank 0 (b,c) claims the middle b before rank 1 (a,b) can use it
    assert(encode(Seq("a", "b", "c"), Seq("b" -> "c", "a" -> "b"))
      == Seq("a", "bc"))
  }

  test("a fired compound rule re-enables a BETTER-ranked rule (re-search)") {
    // (x, bc) is rank 0 but bc only exists after rank 1 fires: the loop
    // must re-search from the top after every application
    assert(encode(Seq("x", "b", "c"), Seq("x" -> "bc", "b" -> "c"))
      == Seq("xbc"))
  }

  test("equals the best-first reference on random compound tables (property)") {
    val alpha = Seq("a", "b", "c")
    val tokGen = Gen.listOfN(16, Gen.oneOf(alpha))
    // rule sides drawn from short concatenations of the alphabet, so
    // compound (multi-level) rules arise naturally
    val sideGen = Gen.choose(1, 2)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(alpha)).map(_.mkString))
    val pairGen = for {
      a <- sideGen; b <- sideGen if a != b
    } yield (a, b)
    val rulesGen = Gen.listOfN(8, pairGen).map(_.distinct)
    val prop = Prop.forAll(tokGen, rulesGen) { (toks, rules) =>
      encode(toks, rules) == bestFirst(toks, rules)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("self-pair rules stay rejected") {
    val e = intercept[Exception] { encode(Seq("a", "a"), Seq("a" -> "a")) }
    assert(e.getMessage.contains("a != b"), e.getMessage)
  }
}
