package graft.queries

import graft.SparkTestBase
import scala.util.Random

/** Randomized losslessness check for the prefix-filtered Jaccard join:
  * on corpora drawn from a SMALL vocabulary (forcing heavy shingle
  * collisions, df ties, tiny sets, and threshold-boundary pairs), the
  * distributed prefix-filtered result must equal a brute-force in-memory
  * all-pairs reference exactly — same pairs, same intersection sizes.
  * Complements the q146 gate (fixed corpora vs the naive DuckDB oracle)
  * with adversarial random structure, at several thresholds.
  */
class PrefixJaccardPropertySpec extends SparkTestBase {

  private def shingleSets(docs: Seq[(Long, String)]): Map[Long, Set[String]] =
    docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      if (t.length < 3) None
      else Some(id -> t.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap

  private def bruteForce(sets: Map[Long, Set[String]],
                         tNum: Long, tDen: Long): Set[(Long, Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size.toLong
      if inter * tDen >= tNum * (a.size + b.size - inter)
    } yield (ids(i), ids(j), inter)).toSet
  }

  test("prefix filtering is lossless on random small-vocabulary corpora") {
    import spark.implicits._
    val rng = new Random(20260813L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 4) {
      val docs = (1L to 60L).map { id =>
        val n = 1 + rng.nextInt(12)
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      val sets = shingleSets(docs)
      val sh = sets.toSeq.flatMap { case (id, ss) => ss.map(id -> _) }
        .toDF("doc_id", "shingle")
      for ((tn, td) <- Seq((3L, 5L), (1L, 2L), (4L, 5L), (1L, 1L))) {
        val got = SimilarityJoinQueries
          .prefixJaccardPairs(sh, "doc_id", "shingle", tn, td)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
          .toSet
        val want = bruteForce(sets, tn, td)
        assert(got == want,
          s"trial $trial t=$tn/$td: missing=${want -- got} extra=${got -- want}")
      }
    }
  }
}
