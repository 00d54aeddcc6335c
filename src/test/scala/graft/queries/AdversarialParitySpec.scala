package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Adversarial cross-engine fuzz harness (round-12, VERDICT item 4).
  *
  * The round-11 ADVICE bugs — q354/q348's ambiguous n-gram separator and
  * q353's silent LONG wrap — passed every gate because the synthetic
  * corpus was collision-free and magnitude-tame: parity between two
  * engines that share the same blind spot proves nothing about the blind
  * spot. This suite regenerates that bug class structurally:
  *
  *   1. a SEEDED corpus of concatenation-ambiguous tokens (every token a
  *      run over one letter, so distinct token sequences collide under an
  *      empty-separator join: ["xx","x"] vs ["x","xx"]) is written as a
  *      real documents.parquet and pushed through the REAL gate code
  *      paths (`SparkEntry.queries` — not copies of their expressions),
  *      compared against independent token-sequence reference
  *      implementations in plain Scala;
  *   2. near-2^31-cent numerics (per-row products at the 2^63 edge) are
  *      pushed through the real q89 fixed-point kernel against a BigInt
  *      reference, plus loud-guard probes for out-of-range and 3-dp
  *      inputs;
  *   3. each hostile corpus is PROVEN hostile by executing the seeded
  *      mutant in-test: the empty-separator gram build must DIVERGE from
  *      the token-sequence truth, and the BigInt moment sums must exceed
  *      Long.MaxValue (a reverted DECIMAL accumulator would wrap). A
  *      corpus that both engines' mutants survive is a fixture, not a
  *      fuzz.
  */
class AdversarialParitySpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** [[CurationQueries.splitColumn]] replayed independently: first 4 hex
    * digits of md5(doc_id) as an int, bucket % 100 < 10 -> eval. */
  private def refSplit(docId: Long): String =
    if (Integer.parseInt(md5hex(docId.toString).take(4), 16) % 100 < 10)
      "eval" else "train"

  // ---- the concatenation-ambiguous corpus ------------------------------
  // tokens are runs over a 2-letter alphabet: any empty-separator join of
  // a token sequence is just the concatenated run lengths, so e.g.
  // ("xx","x") and ("x","xx") — distinct 2-grams — collide; chr(31)
  // separates them. 240 seeded docs, 3..12 tokens each.
  private val vocab = Vector("x", "xx", "xxx", "y", "yy", "xy", "yx")
  private lazy val hostileDocs: Seq[(Long, String, Seq[String])] = {
    val rng = new scala.util.Random(0xD0C5EEDL)
    (1L to 240L).map { id =>
      val toks = Seq.fill(3 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
      (id, s"s${1 + rng.nextInt(3)}", toks)
    }
  }
  private lazy val hostileDocsDir: String = {
    val dir = tmpDir("graft-adv-docs")
    hostileDocs
      .map { case (id, src, toks) =>
        val text = toks.mkString(" ")
        (id, text, "en", src, text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def tokenGrams(toks: Seq[String], n: Int): Seq[Seq[String]] =
    if (toks.size < n) Seq.empty else toks.sliding(n).toSeq

  test("hostility proof: the empty-separator mutant collides on this corpus") {
    // distinct gram TYPES under the truthful token-sequence identity vs
    // under an empty-separator string join — if they ever agreed for all
    // n, the corpus could not catch a reverted chr(31)
    val diverged = (2 to 4).exists { n =>
      val grams = hostileDocs.flatMap(d => tokenGrams(d._3, n))
      grams.distinct.size != grams.map(_.mkString("")).distinct.size
    }
    assert(diverged, "corpus must make the empty-separator join ambiguous")
    // and chr(31) must NOT collide (it never appears inside a token)
    (1 to 4).foreach { n =>
      val grams = hostileDocs.flatMap(d => tokenGrams(d._3, n))
      assert(grams.distinct.size == grams.map(_.mkString("")).distinct.size,
        s"chr(31) join must stay injective at n=$n")
    }
  }

  test("q354 n-gram novelty matches the token-sequence reference on the hostile corpus") {
    val byN = (1 to 4).map { n =>
      val train = hostileDocs.filter(d => refSplit(d._1) == "train")
        .flatMap(d => tokenGrams(d._3, n)).toSet
      val evalGrams = hostileDocs.filter(d => refSplit(d._1) == "eval")
        .flatMap(d => tokenGrams(d._3, n))
      val counts = evalGrams.groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
      val novel = counts.filter { case (g, _) => !train.contains(g) }
      val (evalTotal, evalTypes) = (counts.values.sum, counts.size.toLong)
      val (novelTotal, novelTypes) = (novel.values.sum, novel.size.toLong)
      (n.toLong, evalTotal, evalTypes, novelTotal, novelTypes,
        if (evalTotal == 0) 0L else novelTotal * 1000000L / evalTotal)
    }.filter(_._2 > 0)
    val got = SparkEntry.queries("q354_ngram_novelty")(spark, hostileDocsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == byN, s"q354 hostile-corpus parity:\n got $got\n ref $byN")
  }

  test("q348 self-BLEU matches the token-sequence reference on the hostile corpus") {
    val ref = (for {
      n <- 1 to 4
      (src, docs) <- hostileDocs.groupBy(_._2)
    } yield {
      // per-doc gram counts under the true token-sequence identity
      val cand = for {
        (id, _, toks) <- docs
        (g, c) <- tokenGrams(toks, n).groupBy(identity)
          .map { case (g, o) => (g, o.size.toLong) }
      } yield (id, g, c)
      if (cand.isEmpty) None
      else {
        val clipped = cand.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
          // q348's tie rule: count DESC, doc_id ASC
          val ranked = rows.sortBy(r => (-r._3, r._1))
          val (d1, c1) = (ranked.head._1, ranked.head._3)
          val c2 = ranked.lift(1).map(_._3).getOrElse(0L)
          rows.map { case (id, _, c) =>
            (c, math.min(c, if (id == d1) c2 else c1))
          }
        }
        val total = clipped.map(_._1).sum
        val clip = clipped.map(_._2).sum
        Some((src, n.toLong, clip, total,
          if (total == 0) 0L else clip * 1000000L / total))
      }
    }).flatten.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q348_self_bleu")(spark, hostileDocsDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == ref, s"q348 hostile-corpus parity:\n got $got\n ref $ref")
  }

  test("q26 n-gram jaccard matches the token-sequence reference on the hostile corpus") {
    // the shingle identity is a token TRIPLE; the 2-letter-alphabet vocab
    // makes cross-doc shingle sharing dense, so any separator ambiguity
    // or distinctness bug in the shingle build shifts inter/jaccard
    val sets = hostileDocs
      .map { case (id, _, toks) => (id, tokenGrams(toks, 3).toSet) }
      .filter(_._2.nonEmpty)
    val ref = (for {
      (a, sa) <- sets
      (b, sb) <- sets if a < b
      inter = (sa intersect sb).size if inter > 0
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.15
    } yield (a, b, inter.toLong, j)).sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q26_ngram_jaccard")(spark, hostileDocsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(ref.nonEmpty, "corpus must produce above-threshold pairs")
    assert(got == ref, s"q26 hostile-corpus parity: got ${got.size} pairs, " +
      s"ref ${ref.size}; first diff ${got.zip(ref).find { case (x, y) => x != y }}")
  }

  test("q352 winnowing matches a from-scratch reference on tie-storm texts") {
    // the token corpus is already gram-collision-rich at the CHARACTER
    // level (2-letter alphabet); add pure tie storms and shared blocks
    val extra = Seq(
      (9001L, "z" * 40), (9002L, "zxzxzxzxzxzxzxzxzxzx"),
      (9003L, "aaaaaaaabbbbbbbbaaaaaaaa"), (9004L, "x" * 8))
    val dir = tmpDir("graft-adv-winnow")
    (hostileDocs.map(d => (d._1, d._3.mkString(" "))) ++ extra)
      .map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (k, w) = (8, 4)
    val ref = (hostileDocs.map(d => (d._1, d._3.mkString(" "))) ++ extra)
      .filter(_._2.length >= k)
      .map { case (id, text) =>
        val keys = (1 to text.length - k + 1).map { pos =>
          md5hex(text.substring(pos - 1, pos - 1 + k)) +
            ("0000000" + (1048576 - pos)).takeRight(7)
        }
        val sels = (w to keys.size).map(p => keys.slice(p - w, p).min).distinct
        (id, sels)
      }
      // a doc with fewer than w grams has no full window -> NO output row
      // (doc 9004, length exactly k, pins this)
      .filter(_._2.nonEmpty)
      .map { case (id, sels) =>
        (id, sels.size.toLong, md5hex(sels.sorted.mkString(",")))
      }.sortBy(_._1)
    val got = SparkEntry.queries("q352_winnowing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == ref, s"q352 hostile-corpus parity (first diff: ${
      got.zip(ref).find { case (a, b) => a != b }})")
  }

  test("q63 decontamination: true 8-token contamination counts, a concat near-miss does not") {
    // holdout docs are doc_id % 20 == 0; contaminated corpus docs embed
    // EXACT 8-token holdout windows; doc 5 embeds a window whose
    // empty-separator concatenation equals holdout 20's window but whose
    // TOKENIZATION differs — the shingle identity is the token sequence
    // (space-joined over a space-free vocab), so it must NOT count.
    val h20 = Vector("x", "xx", "y", "yx", "xy", "xxx", "yy", "x", "xx", "y")
    val h40 = Vector("yy", "x", "xx", "xy", "yx", "y", "x", "xxx", "yy", "xx")
    val w20 = h20.slice(0, 8)
    val nearMiss = Vector("xx", "x") ++ w20.drop(2) // ("x","xx") -> ("xx","x")
    assert(nearMiss != w20 && nearMiss.mkString("") == w20.mkString(""),
      "the near-miss must collide under an empty-separator join")
    val rng = new scala.util.Random(0xDEC0DEL)
    def noise(k: Int) = Vector.fill(k)(vocab(rng.nextInt(vocab.size)))
    val docs: Seq[(Long, Vector[String])] = Seq(
      20L -> h20, 40L -> h40,                       // holdout
      1L -> (noise(3) ++ w20 ++ noise(2)),          // contaminated by 20
      2L -> (noise(2) ++ h20.slice(2, 10)),         // contaminated by 20
      3L -> (w20 ++ noise(1) ++ h40.slice(1, 9)),   // contaminated by 20 AND 40
      5L -> (noise(2) ++ nearMiss ++ noise(2)),     // near-miss: must NOT count
      6L -> noise(11), 7L -> noise(9))              // background corpus
    val dir = tmpDir("graft-adv-decon")
    docs.map { case (id, toks) =>
      val text = toks.mkString(" ")
      (id, text, "en", "s1", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // token-sequence reference (distinct 8-windows per doc, as WordShingles)
    val holdGrams = docs.filter(_._1 % 20 == 0)
      .map { case (id, t) => id -> tokenGrams(t, 8).distinct }
    val ref = docs.filter(_._1 % 20 != 0)
      .flatMap { case (id, t) =>
        val gs = tokenGrams(t, 8).distinct
        val sharedGrams = gs.filter(g => holdGrams.exists(_._2.contains(g)))
        val sharedDocs = holdGrams.filter(_._2.exists(gs.contains)).map(_._1)
        if (sharedGrams.isEmpty) None
        else Some((id, sharedGrams.size.toLong, sharedDocs.distinct.size.toLong))
      }.sortBy(_._1)
    val got = SparkEntry.queries("q63_decontamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref, s"q63 hostile parity:\n got $got\n ref $ref")
    assert(ref.map(_._1).toSet == Set(1L, 2L, 3L),
      "exactly the truly contaminated docs — the near-miss doc 5 excluded")
    assert(ref.find(_._1 == 3L).exists(_._3 == 2L),
      "doc 3 must match BOTH holdout docs")
  }

  // ---- fixed-point moment family at the magnitude edge -----------------

  private def writeLineitem(dir: String, rows: Seq[(Double, Double, Double)]): Unit =
    rows.toDF("l_quantity", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("q89 fixed-point moments match a BigInt reference at the 2^31-cent edge") {
    val rng = new scala.util.Random(0xCE17ED6EL)
    // cents near ±(2^31 - 1): per-row squares sit at the 2^62 LONG edge
    // and a few thousand rows push every accumulator far past 2^63
    val cents = Seq.fill(4000)((
      (2147483647L - rng.nextInt(4000)) * (if (rng.nextBoolean()) 1 else -1),
      2147483647L - rng.nextInt(4000), // one-signed: maximal wrap pressure
      rng.nextInt(10000).toLong))
    val dir = tmpDir("graft-adv-moments")
    writeLineitem(dir, cents.map { case (a, b, c) =>
      (a / 100.0, b / 100.0, c / 100.0) })

    // hostility proof: a LONG accumulator (the pre-r11 mutant / a
    // reverted DECIMAL sum) would wrap on this data
    val sumSq = cents.map { case (_, b, _) => BigInt(b) * b }.sum
    assert(sumSq > BigInt(Long.MaxValue),
      "corpus must overflow a LONG sum-of-squares accumulator")

    def mom(f: ((Long, Long, Long)) => BigInt): BigInt = cents.map(f).sum
    val n = BigInt(cents.size)
    def corr(sx: BigInt, sy: BigInt, sxy: BigInt, sxx: BigInt, syy: BigInt): Option[Double] = {
      // replay the gate's arithmetic EXACTLY: decimal sums -> double,
      // scale to the value domain, then double-domain corr + 6-dp round
      def d(v: BigInt, scale: Double) = v.toDouble / scale
      val (s1d, s2d) = (d(sx, 100), d(sy, 100))
      val (s11, s22, s12) = (d(sxx, 10000), d(syy, 10000), d(sxy, 10000))
      val nn = n.toDouble
      val denom = math.sqrt(math.max(nn * s11 - s1d * s1d, 0.0)) *
        math.sqrt(math.max(nn * s22 - s2d * s2d, 0.0))
      if (denom > 0)
        Some(BigDecimal(((nn * s12 - s1d * s2d) / denom))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
    val (sa, sb, sc) = (mom(r => BigInt(r._1)), mom(r => BigInt(r._2)), mom(r => BigInt(r._3)))
    val saa = mom(r => BigInt(r._1) * r._1); val sbb = mom(r => BigInt(r._2) * r._2)
    val scc = mom(r => BigInt(r._3) * r._3); val sab = mom(r => BigInt(r._1) * r._2)
    val sac = mom(r => BigInt(r._1) * r._3); val sbc = mom(r => BigInt(r._2) * r._3)
    val ref = Seq(
      ("l_quantity", "l_extendedprice", corr(sa, sb, sab, saa, sbb)),
      ("l_quantity", "l_discount", corr(sa, sc, sac, saa, scc)),
      ("l_extendedprice", "l_discount", corr(sb, sc, sbc, sbb, scc)))
      .sortBy(r => (r._1, r._2)) // the gate orders by (col_a, col_b)
    val got = SparkEntry.queries("q89_correlation_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == ref, s"q89 edge-magnitude parity:\n got $got\n ref $ref")
  }

  test("q89 guards raise loudly instead of wrapping or quantizing") {
    def expectRaise(rows: Seq[(Double, Double, Double)], frag: String): Unit = {
      val dir = tmpDir("graft-adv-guard")
      writeLineitem(dir, rows)
      val ex = intercept[Exception] {
        SparkEntry.queries("q89_correlation_matrix")(spark, dir).collect()
      }
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil
        else Option(t.getMessage).toList ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains(frag)),
        s"expected a loud '$frag' guard, got: ${msgs(ex).mkString(" | ")}")
    }
    // one cent past the 2^31 lift bound: a LONG product could pass 2^63
    expectRaise(Seq((21474836.48, 1.0, 0.05), (1.0, 1.0, 0.0)), "q89")
    // a 3-dp value: both engines would silently cent-quantize in lockstep
    expectRaise(Seq((1.234, 1.0, 0.05), (1.0, 1.0, 0.0)), "q89")
  }

  // ---- round-13 targets: langid, Aho–Corasick, BPE train ---------------
  // the same separator/Unicode/identity bug class, three more real paths

  private def writeDocs(dir: String, docs: Seq[(Long, String, String)]): Unit =
    docs.map { case (id, text, lang) => (id, text, lang, "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q23 lang-id matches a plain-Scala replay on a marker-ambiguous corpus") {
    // hostile axes: markers SHARED across languages ('de','un' ∈ fr∩es;
    // 'a' ∈ en-markers AND is a common article in es), tie rows that only
    // the precedence cascade disambiguates, single-space-split hazards
    // (double spaces -> empty tokens; an embedded TAB is NOT a separator),
    // case sensitivity ('The' must not count), punctuation-glued markers
    val docs: Seq[(Long, String, String)] = Seq(
      (1L, "the a of and is", "en"),                  // clean en
      (2L, "le la et de un", "fr"),                   // clean fr
      (3L, "el los y de un", "es"),                   // clean es
      (4L, "de un de un", "fr"),                      // fr/es TIE -> fr wins
      (5L, "the le la", "en"),                        // en ties fr at 1? no: en=1, fr=2 -> fr
      (6L, "the  the", "en"),                         // double space -> empty token
      (7L, "the\tthe", "en"),                         // tab-joined: ONE token, no marker
      (8L, "The Der Le", "en"),                       // case: all unknown
      (9L, "the. de, und!", "de"),                    // punctuation-glued: unknown
      (10L, "le la der die", "de"),                   // fr TIES de at 2: cascade checks fr first
      (11L, "", "en"),                                // empty text
      (12L, "y y y el", "es"),                        // es via 'y' repeats
      (13L, "a a a", "es"))                           // 'a' is an EN marker: predicted en, labelled es
    val dir = tmpDir("graft-adv-langid")
    writeDocs(dir, docs)
    def toks(t: String): Seq[String] = t.split(" ", -1).toSeq
    val markers = Map(
      "en" -> Set("the", "a", "of", "and", "is"),
      "fr" -> Set("le", "la", "et", "de", "un"),
      "es" -> Set("el", "los", "y", "de", "un"),
      "de" -> Set("der", "die", "und", "das", "ein"))
    def score(t: String, lang: String): Int = toks(t).count(markers(lang))
    def predict(t: String): String = {
      val (en, fr, es, de) =
        (score(t, "en"), score(t, "fr"), score(t, "es"), score(t, "de"))
      if (en >= (fr max es max de) && en > 0) "en"
      else if (fr >= (es max de) && fr > 0) "fr"
      else if (es >= de && es > 0) "es"
      else if (de > 0) "de" else "unknown"
    }
    // hostility proofs: the corpus distinguishes the mutant tokenizers
    assert(docs.exists { case (_, t, _) =>
        predict(t) != predict(t.split("\\s+", -1).mkString(" ")) },
      "a whitespace-regex tokenizer mutant must diverge on this corpus")
    assert(docs.exists { case (_, t, _) => predict(t) != predict(t.toLowerCase) },
      "a case-folding mutant must diverge on this corpus")
    assert(predict(docs.find(_._1 == 10L).get._2) == "fr",
      "doc 10 pins the cascade order: fr is checked before de")
    val ref = docs.groupBy(d => (d._3, predict(d._2)))
      .map { case ((lang, p), rows) => (lang, p, rows.size.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q23_lang_id")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == ref, s"q23 hostile parity:\n got $got\n ref $ref")
  }

  test("q310 Aho–Corasick matches brute-force overlapping counts on nested-pattern storms") {
    // the gate's fixed dictionary has nested + self-overlapping patterns;
    // this corpus maximizes the hazards: overlap chains ('a a a a a'),
    // patterns glued without separators, matches at text start/end,
    // a pattern equal to the whole text
    val pats = Seq("table value", "a a", "fast table", "query key scan",
      "a a a", "merge batch", "table", "stream stream", "slow fast",
      "value fast")
    val docs: Seq[(Long, String, String)] = Seq(
      (1L, "a a a a a", "en"),                       // 'a a' x4 overlapping, 'a a a' x3
      (2L, "tabletable table", "en"),                // glued: 'table' x3
      (3L, "table value fast table value", "en"),    // overlapping dictionary entries
      (4L, "stream stream stream", "en"),            // self-overlap x2
      (5L, "table", "en"),                           // pattern == text
      (6L, "slow fast table value fast", "en"),      // chained overlaps across patterns
      (7L, "query key scans", "en"),                 // superstring still matches once
      (8L, "no hits here", "en"))
    val dir = tmpDir("graft-adv-aho")
    writeDocs(dir, docs)
    def overlapping(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
    def nonOverlapping(text: String, p: String): Long = {
      var i = 0; var n = 0L
      while ({ i = text.indexOf(p, i); i >= 0 }) { n += 1; i += p.length }
      n
    }
    // hostility proof: an advance-by-length (non-overlapping) mutant
    // undercounts on this corpus
    assert(docs.exists { case (_, t, _) =>
        pats.exists(p => overlapping(t, p) != nonOverlapping(t, p)) },
      "corpus must separate overlapping from non-overlapping counting")
    val ref = (for {
      (id, text, _) <- docs
      (p, pid) <- pats.zipWithIndex
      n = overlapping(text, p) if n > 0
    } yield (id, pid.toLong, p, n)).sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q310_multipattern_tag")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == ref, s"q310 hostile parity:\n got $got\n ref $ref")
  }

  test("q24 fingerprints match a plain-Scala replay on a whitespace-hostile corpus") {
    // the rolling hash folds TOKEN LENGTHS — the separator bug class in
    // its purest form: a double space contributes an EMPTY token (length
    // 0, still one fold step), a tab glues two words into one longer
    // token, trailing spaces append empty steps. A \s+-splitting or
    // trimming mutant silently folds a different sequence
    val docs: Seq[(Long, String, String)] = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha  beta", "en"),          // empty token: one extra 0-length step
      (3L, "alpha beta ", "en"),          // trailing empty token
      (4L, "alpha\tbeta gamma", "en"),    // tab: ONE 10-char token, not two
      (5L, "ALPHA Beta", "en"),           // md5 is over lowered tokens
      (6L, "", "en"))                     // empty text: [""] — a single 0-length step
    val dir = tmpDir("graft-adv-fp")
    writeDocs(dir, docs)
    def toks(t: String): Seq[String] = t.split(" ", -1).toSeq
    def rollFp(t: String): Long =
      toks(t).foldLeft(7L)((acc, w) => (acc * 1000003L + w.length) % 2147483647L)
    def contentMd5(t: String): String =
      md5hex(toks(t).map(_.toLowerCase).mkString(" "))
    // hostility proofs: both mutant tokenizations fold different sequences
    assert(docs.exists { case (_, t, _) =>
        rollFp(t) != toks(t).filter(_.nonEmpty).foldLeft(7L)(
          (acc, w) => (acc * 1000003L + w.length) % 2147483647L) },
      "an empty-token-dropping mutant must diverge on this corpus")
    assert(docs.exists { case (_, t, _) =>
        toks(t).map(_.length) !=
          t.split("\\s+", -1).toSeq.map(_.length) },
      "a whitespace-regex mutant must fold a different length sequence")
    val ref = docs.map { case (id, t, _) => (id, contentMd5(t), rollFp(t)) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q24_fingerprint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == ref, s"q24 hostile parity:\n got $got\n ref $ref")
  }

  test("q334 BPE training matches a from-scratch trainer on a merge-collision corpus") {
    // hostile axes: a merged token that COLLIDES with a pre-existing
    // token ('x'+'y' = 'xy', which the corpus already contains — rounds
    // after the merge must conflate them, exactly as both engines do),
    // tie-rich pair counts (the (cnt DESC, a, b) rule decides rounds),
    // and adjacent self-pairs ('x x') that candidates must EXCLUDE
    val rng = new scala.util.Random(0xB9E5EEDL)
    val bpeVocab = Vector("x", "y", "xy", "z", "yx")
    val fixed = Seq(
      "x y x y x y",     // makes ('x','y') strong; merged 'xy' collides
      "xy z xy z",       // pre-existing 'xy' tokens
      "x x x x",         // self-pairs only: must contribute NO candidate
      "y x y x",         // ('y','x') -> 'yx' collides with vocab 'yx'
      "z x y z")
    val docs: Seq[(Long, String, String)] =
      (fixed ++ (1 to 40).map(_ =>
        Seq.fill(2 + rng.nextInt(9))(bpeVocab(rng.nextInt(bpeVocab.size))).mkString(" ")))
        .zipWithIndex.map { case (t, i) => ((i + 1).toLong, t, "en") }
    val dir = tmpDir("graft-adv-bpe")
    writeDocs(dir, docs)

    // from-scratch incremental trainer (Sennrich): count a≠b adjacencies,
    // adopt min by (-cnt, a, b), one left-to-right merge pass per round
    def mergePass(w: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.size) {
        if (i + 1 < w.size && w(i) == a && w(i + 1) == b) { out += (a + b); i += 2 }
        else { out += w(i); i += 1 }
      }
      out.result()
    }
    var state = docs.map(_._2.split(" ", -1).toVector)
    val ref = Seq.newBuilder[(Long, String, String, Long, Long, Long)]
    var round = 1
    var done = false
    while (round <= 10 && !done) {
      val pairs = state.filter(_.size >= 2)
        .flatMap(w => w.zip(w.tail)).filter { case (a, b) => a != b }
      if (pairs.isEmpty) done = true
      else {
        val counts = pairs.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        ref += ((round.toLong, a, b, cnt, counts.size.toLong, counts.values.sum))
        state = state.map(mergePass(_, a, b))
        round += 1
      }
    }
    val refRules = ref.result()

    // hostility proofs: (1) some adopted rule's concatenation collides
    // with a base-vocab token; (2) some round is decided by the tie rule;
    // (3) a mutant that admits self-pairs would adopt a different rule
    assert(refRules.exists(r => bpeVocab.contains(r._2 + r._3)),
      "corpus must force a merged-token/vocab collision")
    val r1counts = docs.map(_._2.split(" ", -1).toVector).filter(_.size >= 2)
      .flatMap(w => w.zip(w.tail)).filter { case (a, b) => a != b }
      .groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    assert({
      val selfCounts = docs.map(_._2.split(" ", -1).toVector).filter(_.size >= 2)
        .flatMap(w => w.zip(w.tail))
        .groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
      selfCounts.minBy { case ((a, b), c) => (-c, a, b) } !=
        r1counts.minBy { case ((a, b), c) => (-c, a, b) } ||
        selfCounts.keySet.exists { case (a, b) => a == b }
    }, "corpus must carry self-pairs the candidate filter has to exclude")

    val got = SparkEntry.queries("q334_bpe_vocab_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == refRules, s"q334 hostile parity:\n got $got\n ref $refRules")
  }
}
