package graft.dedup

import graft.SparkTestBase

/** Controlled-duplicate recall: build a synthetic corpus with planted
  * high-overlap near-duplicates and verify banded MinHash removes exactly
  * the planted copies and nothing else.
  */
class MinhashRecallSpec extends SparkTestBase {

  test("banding removes planted 90%-overlap copies, keeps distinct docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 500).map(i => s"w$i")
    def doc(): Seq[String] = Seq.fill(60)(vocab(rnd.nextInt(vocab.length)))

    val originals = (0 until 120).map(i => (i.toLong, doc()))
    // every 4th doc gets a near-copy: ~10% of tokens replaced
    val copies = originals.filter(_._1 % 4 == 0).map { case (id, toks) =>
      val mutated = toks.map(t =>
        if (rnd.nextDouble() < 0.10) vocab(rnd.nextInt(vocab.length)) else t)
      (id + 1000, mutated)
    }
    val corpus = (originals ++ copies)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")

    val out = Dedup.nearMinhash(corpus, "doc_id", "text")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet

    val plantedCopyIds = copies.map(_._1).toSet
    val removedCopies = plantedCopyIds.diff(kept)
    // near-identical 3-gram shingle sets → banding should catch nearly all
    assert(removedCopies.size >= (plantedCopyIds.size * 0.9).toInt,
      s"recall too low: removed ${removedCopies.size}/${plantedCopyIds.size}")
    // survivors are the min-id originals; no original lost to a copy
    val originalIds = originals.map(_._1).toSet
    val removedOriginals = originalIds.diff(kept)
    assert(removedOriginals.isEmpty,
      s"originals wrongly removed: $removedOriginals")
  }
}
