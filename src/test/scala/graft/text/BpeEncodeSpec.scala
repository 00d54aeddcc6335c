package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Handchecks + the equivalence property behind
  * [[org.apache.spark.sql.graft.BpeEncode]]: applying single-level rules
  * exhaustively in rank order must equal greedy BEST-FIRST rounds (the
  * textbook BPE loop), because a merge of word-level pairs can only
  * destroy other occurrences, never create them. */
class BpeEncodeSpec extends SparkTestBase {
  import spark.implicits._

  private def encode(toks: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(toks)).toDF("w")
      .select(graft.functions.bpe.encode($"w", rules).as("e"))
      .collect().head.getSeq[String](0)

  /** Reference: textbook best-first loop — each round finds the present
    * pair with the lowest rank and merges all its occurrences
    * left-to-right, until no rule matches. */
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
            out += s"$a $b"; i += 2
          } else { out += cur(i); i += 1 }
        }
        cur = out.result()
      }
    }
    cur
  }

  test("single rule merges all occurrences left-to-right") {
    assert(encode(Seq("a", "b", "a", "b", "c"), Seq("a" -> "b")) ==
      Seq("a b", "a b", "c"))
  }

  test("rule priority decides overlapping claims") {
    // (b,c) outranks (a,b): "a b c" must become ["a", "b c"], not ["a b", "c"]
    assert(encode(Seq("a", "b", "c"), Seq("b" -> "c", "a" -> "b")) ==
      Seq("a", "b c"))
    // flipped priority → the other split
    assert(encode(Seq("a", "b", "c"), Seq("a" -> "b", "b" -> "c")) ==
      Seq("a b", "c"))
  }

  test("merged tokens never re-match single-level rules") {
    // after (a,b) → "a b", the pair ("a b", "c") is NOT rule (b, c)
    assert(encode(Seq("a", "b", "c"), Seq("a" -> "b")) == Seq("a b", "c"))
  }

  test("no applicable rule → identity; empty/singleton arrays pass through") {
    assert(encode(Seq("q", "r"), Seq("a" -> "b")) == Seq("q", "r"))
    assert(encode(Seq("q"), Seq("a" -> "b")) == Seq("q"))
    assert(encode(Seq.empty, Seq("a" -> "b")) == Seq.empty)
  }

  test("rank-order exhaustive application == best-first rounds (property)") {
    val tokGen = Gen.listOfN(24, Gen.oneOf("a", "b", "c", "d", "e"))
    val pairGen = for {
      a <- Gen.oneOf("a", "b", "c", "d", "e")
      b <- Gen.oneOf("a", "b", "c", "d", "e") if a != b
    } yield (a, b)
    val rulesGen = Gen.listOfN(6, pairGen).map(_.distinct)
    val prop = Prop.forAll(tokGen, rulesGen) { (toks, rules) =>
      encode(toks, rules) == bestFirst(toks, rules)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("self-pair rules are rejected loudly") {
    val e = intercept[Exception] { encode(Seq("a", "a"), Seq("a" -> "a")) }
    assert(e.getMessage.contains("a != b"), e.getMessage)
  }

  test("rule sides containing the merge separator are rejected loudly") {
    // multi-level rules ("a b" -> c) would need iterative re-merging the
    // single-pass encoder does not implement — accepting them would
    // silently produce neither semantics
    val e = intercept[Exception] { encode(Seq("a", "b", "c"), Seq("a b" -> "c")) }
    assert(e.getMessage.contains("merge separator"), e.getMessage)
  }
}
