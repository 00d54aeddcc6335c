package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Native expressions: ArrayDotProduct (codegen + interpreted paths) and
  * the TopKScoreId aggregate vs the window formulation it replaces. */
class NativeFunctionsSpec extends SparkTestBase {

  test("dot product matches a sequential fold; null array yields null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.5, -0.5), Seq(2.0, 2.0)))
      .toDF("id", "a", "b")
    val out = df.select($"id", vector.dot($"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 32.0 && out(2L) == 0.0)

    val withNull = df.withColumn("c", when($"id" === 1, $"a"))
    val nd = withNull.select(vector.dot($"c", $"b")).collect()
    assert(!nd(0).isNullAt(0) && nd(1).isNullAt(0))
  }

  test("dot product auto-casts float arrays") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(vector.dot($"a", $"b")).head.getDouble(0) == 11.0)
  }

  test("norm is sqrt of self-dot") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
    assert(df.select(vector.norm($"v")).head.getDouble(0) == 5.0)
  }

  test("jlSignProject matches an independent sign-matrix recompute; null array yields null") {
    import spark.implicits._
    val d = 64; val m = 16
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 25).map(i =>
      (i.toLong, Seq.fill(d)(rnd.nextInt(4000001).toLong - 2000000)))
    val df = vecs.toDF("id", "qv")
    val out = df.select($"id",
      vector.jlSignProject($"qv", m, d).as("s"))
      .select($"id", $"s.p", $"s.n2", $"s.pn2")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    // independent replay of the documented recurrence
    def sign(j: Int, k: Int): Long = {
      val cell = ((j.toLong * d + k + 1) * 2654435761L) % 4294967296L
      if (cell / 2048 % 2 == 0) 1L else -1L
    }
    // the matrix must not be degenerate: both signs present in every row
    for (j <- 0 until m) {
      val signs = (0 until d).map(sign(j, _)).toSet
      assert(signs == Set(1L, -1L), s"projection row $j is constant-sign")
    }
    vecs.foreach { case (id, qv) =>
      val p = (0 until m).map(j =>
        (0 until d).map(k => qv(k) * sign(j, k)).sum)
      val n2 = qv.map(v => v * v).sum
      val pn2 = p.map(v => v * v).sum
      assert(out(id) == ((p, n2, pn2)), s"vector $id")
    }
    // null-safe contract
    val nd = df.withColumn("qv", when($"id" === 0, $"qv"))
      .select(vector.jlSignProject($"qv", m, d)).collect()
    assert(!nd.find(_ != null).isEmpty)
    assert(nd.count(_.isNullAt(0)) == vecs.size - 1)
  }

  test("jlSignProject interpreted path (eval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.graft.JlSignProject
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val d = 8; val m = 4
    val qv = Array.tabulate(d)(k => (k * 37 - 100).toLong)
    val e = JlSignProject(BoundReference(0, ArrayType(LongType), nullable = true), m, d)
    val row = InternalRow(new GenericArrayData(qv))
    val viaEval = e.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val p = viaEval.getArray(0).toLongArray()
    def sign(j: Int, k: Int): Long = {
      val cell = ((j.toLong * d + k + 1) * 2654435761L) % 4294967296L
      if (cell / 2048 % 2 == 0) 1L else -1L
    }
    val expP = (0 until m).map(j => (0 until d).map(k => qv(k) * sign(j, k)).sum)
    assert(p.toSeq == expP)
    assert(viaEval.getLong(1) == qv.map(v => v * v).sum)
    assert(viaEval.getLong(2) == expP.map(v => v * v).sum)
    // eval on a null input respects the null contract
    assert(e.eval(InternalRow(null)) == null)
  }

  test("jaroWinklerPpm matches canonical values and the pinned DuckDB semantics") {
    import spark.implicits._
    // (a, b, expected ppm) — textbook values plus the cases that pin the
    // implementation ambiguities: integer-floored transpositions
    // (abcdef/bcadef h=3 -> t=1 -> 944444, not 916667), the strict 0.7
    // boost threshold (abcvwxyz/abcdefgh jaro=7/12 stays unboosted), and
    // the 4-char prefix cap (dixon/dicksonx l=2).
    val cases = Seq(
      ("martha", "marhta", 961111L),
      ("dixon", "dicksonx", 813333L),
      ("dwayne", "duane", 840000L),
      ("abcvwxyz", "abcdefgh", 583333L),
      ("abcdef", "bcadef", 944444L),
      ("aaaaa", "aaxxx", 600000L),
      ("ab", "xy", 0L),
      ("same", "same", 1000000L),
      ("", "", 1000000L),
      ("x", "", 0L))
    val out = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(stringsim.jaroWinklerPpm($"a", $"b")).collect().map(_.getLong(0))
    assert(out.toSeq == cases.map(_._3))
    // null contract
    val nd = Seq(("x", Option.empty[String])).toDF("a", "b")
      .select(stringsim.jaroWinklerPpm($"a", $"b")).collect()
    assert(nd(0).isNullAt(0))
    // interpreted eval path agrees with the codegen'd column path
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { case (a, b, exp) =>
      assert(org.apache.spark.sql.graft.JaroWinkler
        .ppm(UTF8String.fromString(a), UTF8String.fromString(b)) == exp)
    }
    // long inputs: jwNum ~ 30·L³ wrapped Long past ~5–6k chars before the
    // BigInt slow path; these would return garbage on the old kernel.
    val long1 = "a" * 6000
    assert(org.apache.spark.sql.graft.JaroWinkler
      .ppm(UTF8String.fromString(long1), UTF8String.fromString(long1)) == 1000000L)
    // "a"*6000 vs "a"*3000: jaro = 5/6, boost l=4 → jw = 9/10 exactly
    assert(org.apache.spark.sql.graft.JaroWinkler
      .ppm(UTF8String.fromString(long1), UTF8String.fromString("a" * 3000)) == 900000L)
  }

  test("ahoCorasickCounts counts overlapping and nested matches in one pass") {
    import spark.implicits._
    val pats = Seq("aa", "aaa", "ab", "b", "xyz")
    // "aaaab": aa at 0,1,2 (overlap) = 3; aaa at 0,1 = 2; ab at 3 = 1; b = 1
    val df = Seq("aaaab", "xyzxyz", "", "none").toDF("t")
    val out = df.select(multipattern.ahoCorasickCounts($"t", pats))
      .collect().map(_.getSeq[Long](0))
    assert(out(0) == Seq(3L, 2L, 1L, 1L, 0L))
    assert(out(1) == Seq(0L, 0L, 0L, 0L, 2L))
    assert(out(2) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(out(3) == Seq(0L, 0L, 0L, 0L, 0L))
    // brute-force cross-check on random strings over a tiny alphabet (the
    // regime where fail links actually fire)
    val rnd = new scala.util.Random(11)
    val texts = (0 until 40).map(_ =>
      (0 until 60).map(_ => "ab" (rnd.nextInt(2))).mkString)
    val p2 = Seq("a", "ab", "ba", "aba", "bb", "abab")
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong
    val got = texts.toDF("t")
      .select($"t", multipattern.ahoCorasickCounts($"t", p2).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { t =>
      assert(got(t) == p2.map(brute(t, _)), s"text $t")
    }
    // null text -> null
    val nd = Seq(Option.empty[String]).toDF("t")
      .select(multipattern.ahoCorasickCounts($"t", pats)).collect()
    assert(nd(0).isNullAt(0))
  }

  test("ahoCorasickSpans reports every overlapping match at exact 1-based offsets") {
    import spark.implicits._
    val p2 = Seq("a", "ab", "ba", "aba", "bb", "abab")
    val rnd = new scala.util.Random(13)
    val texts = "aaaab" +: "abab" +: (0 until 30).map(_ =>
      (0 until 50).map(_ => "ab" (rnd.nextInt(2))).mkString)
    def brute(t: String): Seq[(Int, Int, Int)] =
      for {
        (p, pid) <- p2.zipWithIndex
        i <- 1 to t.length - p.length + 1
        if t.startsWith(p, i - 1)
      } yield (pid, i, i + p.length - 1)
    val got = texts.toDF("t")
      .select($"t", multipattern.ahoCorasickSpans($"t", p2).as("sp"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getInt(1), x.getInt(2)))).toMap
    texts.foreach { t =>
      assert(got(t).sorted == brute(t).sorted, s"text $t")
      // every span substring really is its pattern
      got(t).foreach { case (pid, s0, e0) =>
        assert(t.substring(s0 - 1, e0) == p2(pid))
      }
    }
  }

  test("topKByScore equals window row_number formulation, including ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for {
      g <- 0 until 20
      i <- 0 until 50
    } yield (g.toLong, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0) // forced ties
    val df = rows.toDF("g", "id", "score").repartition(7) // multiple partials
    val viaAgg = df.groupBy($"g")
      .agg(aggregates.topKByScore($"score", $"id", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk0", "t")))
      .select($"g", ($"rk0" + 1).as("rk"), $"t.id".as("id"), $"t.score".as("score"))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"g", $"rk", $"id", $"score")
    assert(viaAgg.orderBy($"g", $"rk").collect().toSeq ==
      viaWindow.orderBy($"g", $"rk").collect().toSeq)
  }

  test("topKByScore with fewer rows than k returns all, ordered") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("g", "id", "score")
    val out = df.groupBy($"g")
      .agg(aggregates.topKByScore($"score", $"id", 5).as("top"))
      .select(posexplode($"top"))
      .collect().map(_.getStruct(1)).map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((0.9, 11L), (0.5, 10L)))
  }

  test("WordShingles equals the array_distinct/transform HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 8)) {
      val hof = df.select($"id", expr(
        // guard: sequence(1, 0) DESCENDS in Spark, so short arrays need
        // an explicit empty branch
        s"IF(size(toks) < $n, array(), " +
          s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', ${(0 until n).map(o => s"element_at(toks, i + $o)").mkString(", ")}))))"
      ).as("sh")).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val native = df.select($"id", text.shingles($"toks", n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == hof, s"n=$n")
    }
  }

  test("SimHashBits matches a reference MD5 bit-vote computation") {
    import spark.implicits._
    def ref(toks: Seq[String], nbits: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](nbits)
      toks.foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        for (bp <- 0 until nbits) {
          val digit = Integer.parseInt(hex.charAt(bp / 4).toString, 16)
          val bit = (digit >> (3 - (bp % 4))) & 1
          votes(bp) += (if (bit == 1) 1 else -1)
        }
      }
      (0 until nbits).foldLeft(0L)((h, bp) => if (votes(bp) >= 0) h | (1L << bp) else h)
    }
    val rows = Seq(
      (1L, Seq("alpha", "beta", "gamma", "alpha")),
      (2L, Seq("x")),
      (3L, Seq.empty[String]))
    val df = rows.toDF("id", "toks")
    for (nbits <- Seq(32, 60, 63)) {
      val got = df.select($"id", text.simhash($"toks", nbits).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, toks) =>
        assert(got(id) == ref(toks, nbits), s"id=$id nbits=$nbits")
      }
    }
  }

  test("word_shingles and simhash_bits are callable from SQL text") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS sh, " +
        "simhash_bits(array('a','b'), 16) AS h").head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 16))
  }

  test("topKByScoreStr equals window row_number formulation, including ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("apple", "pear", "fig", "kiwi", "plum", "date", "lime")
    val rows = for { g <- 0 until 10; _ <- 0 until 60 } yield
      (g.toLong, vocab(rnd.nextInt(vocab.size)) + rnd.nextInt(9),
        math.floor(rnd.nextDouble() * 10) / 10.0)
    val df = rows.toDF("g", "id", "score").repartition(5)
    val viaAgg = df.groupBy($"g")
      .agg(aggregates.topKByScoreStr($"score", $"id", 4).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk0", "t")))
      .select($"g", ($"rk0" + 1).as("rk"), $"t.id".as("id"), $"t.score".as("score"))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
      .select($"g", $"rk", $"id", $"score")
    val a = viaAgg.orderBy("g", "rk").collect().map(_.toString).toSeq
    val b = viaWindow.orderBy("g", "rk").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("topKByScore handles NaN scores like the window formulation") {
    import spark.implicits._
    // IEEE comparisons make NaN incomparable; the aggregate must use a
    // total order (NaN largest, like Spark's sort) and never crash
    val rows = (0L until 40L).map(i =>
      (i % 2, i, if (i % 7 == 0) Double.NaN else i.toDouble / 10))
    val df = rows.toDF("g", "id", "score").repartition(6)
    val viaAgg = df.groupBy($"g")
      .agg(aggregates.topKByScore($"score", $"id", 3).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk0", "t")))
      .select($"g", ($"rk0" + 1).as("rk"), $"t.id".as("id"))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"g", $"rk", $"id")
    assert(viaAgg.orderBy("g", "rk").collect().toSeq ==
      viaWindow.orderBy("g", "rk").collect().toSeq)
  }
}
