package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Engine-internal replay for the q330 unigram-Viterbi gate: rebuild the
  * vocabulary (top-200 1–4-grams + all 1-grams) and run the exact DP with
  * the same tie rule in plain Scala, then require the gate's
  * segmentations, scores and piece counts to match row for row. Also
  * asserts optimality against two independent baselines (all-singles and
  * greedy longest-match), so a DP regression that still matches a broken
  * oracle would be caught here. */
class UnigramViterbiSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q330 segmentations replay from a plain-Scala DP and are optimal") {
    import spark.implicits._
    val out = SparkEntry.queries("q330_unigram_viterbi")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("score"), r.getAs[Long]("n_pieces"))))
      .toMap
    assert(out.nonEmpty)

    val names = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val grams = names.flatMap { case (_, s) =>
      for (l <- 1 to 4; i <- 0 to s.length - l) yield s.substring(i, i + l)
    }.groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    val top = grams.toSeq.sortBy { case (g, c) => (-c, g) }.take(200)
    val vocab = (top ++ grams.filter(_._1.length == 1)).toMap

    def dp(s: String): (String, Long, Long) = {
      val n = s.length
      val best = Array.fill(n + 1)(Long.MinValue)
      val from = Array.fill(n + 1)(-1)
      best(0) = 0L; from(0) = 0
      for (k <- 1 to n; l <- math.min(4, k) to 1 by -1
           if from(k - l) >= 0) {
        vocab.get(s.substring(k - l, k)).foreach { w =>
          val sc = best(k - l) + w * l * l
          if (sc > best(k)) { best(k) = sc; from(k) = l } // strict: longer l wins ties
        }
      }
      var pos = n; var pieces = List.empty[String]
      while (pos > 0) {
        pieces = s.substring(pos - from(pos), pos) :: pieces
        pos -= from(pos)
      }
      (pieces.mkString("|"), best(n), pieces.length.toLong)
    }

    names.foreach { case (k, s) =>
      assert(out(k) == dp(s), s"customer $k: ${out(k)} vs ${dp(s)}")
      // optimality vs all-singles
      val singles = s.map(c => vocab(c.toString)).sum
      assert(out(k)._2 >= singles, s"worse than singles for $k")
      // optimality vs greedy longest-match
      var pos = 0; var g = 0L
      while (pos < s.length) {
        val l = (math.min(4, s.length - pos) to 1 by -1)
          .find(l0 => vocab.contains(s.substring(pos, pos + l0))).get
        g += vocab(s.substring(pos, pos + l)) * l * l
        pos += l
      }
      assert(out(k)._2 >= g, s"worse than greedy for $k")
    }
    // the fixture must exercise a non-trivial vocabulary (multi-char
    // pieces actually chosen somewhere)
    assert(out.values.exists(_._1.contains("|")) &&
      out.values.exists(v => v._1.split('|').exists(_.length > 1)))
  }
}
