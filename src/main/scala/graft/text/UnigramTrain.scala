package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LM VOCABULARY TRAINING — the hard-EM (Viterbi) induction loop
  * of a SentencePiece-style unigram tokenizer (Kudo 2018, "Subword
  * Regularization"), the training-side counterpart of the
  * [[org.apache.spark.sql.graft.UnigramViterbiSeg]] inference kernel that
  * q330 gates: where BPE training (see [[BpeTrain]]) LEARNS merges
  * bottom-up, unigram training starts from an over-complete seed
  * vocabulary and ITERATIVELY re-estimates piece weights from the
  * corpus's own optimal segmentations, pruning pieces the corpus stops
  * using.
  *
  * SEMANTIC CONTRACT (pinned so a DuckDB oracle can replay every round):
  *  - seed vocabulary = the top-`topK` character 1..`maxPieceLen`-grams
  *    by corpus frequency (ties: count DESC, piece ASC) UNION all
  *    1-grams, each weighted by its corpus gram count — exactly q330's
  *    vocabulary construction, so round 1 of this loop IS q330's model;
  *  - E-step (hard): segment every string with the round's weights under
  *    the exact-integer Viterbi objective Σ weight(piece)·len(piece)²
  *    and the kernel's pinned tie rule (score DESC, longer final piece);
  *  - M-step: weight'(piece) = corpus-wide usage count of the piece in
  *    the round's segmentations (all-integer re-estimation — the
  *    hard-EM analogue of Kudo's expected-count M-step, chosen over
  *    soft EM because it is exactly replayable in integer arithmetic);
  *  - pruning: multi-character pieces with zero usage leave the
  *    vocabulary; 1-grams always remain (weight = usage, possibly 0),
  *    so segmentation stays TOTAL by construction in every round — the
  *    SentencePiece invariant that single characters are never pruned.
  *
  * SCALE SHAPE (100 TB): per round ONE zero-shuffle projection (the
  * codegen'd Viterbi kernel, vocabulary shared per task binary via
  * `addReferenceObj`) feeding ONE map-side-combinable piece count; the
  * rounds are sequential but each is a single scan+agg job. Driver
  * traffic per round is the usage table, which is bounded by the
  * vocabulary size (≤ topK + |alphabet| rows by construction — the same
  * growth-bounded model-pull class as q142/q330), never data-sized. The
  * corpus itself never moves: no joins, no windows, no repartition.
  */
object UnigramTrain {

  /** One vocabulary piece's round trajectory: the weight it ENTERED the
    * round with (`wIn`) and the usage count the round's segmentations
    * assigned it (`nUsed` — the weight it exits with, if > 0). */
  final case class PieceRound(round: Int, piece: String, wIn: Long, nUsed: Long)

  /** Runs `rounds` hard-EM rounds over `df`'s string column `textCol`.
    * Returns the full per-round usage trajectory (only pieces with
    * usage ≥ 1 — zero-usage pieces are exactly the pruned set, recoverable
    * as vocab(r) minus the round-r rows). Rows are ordered (round, piece).
    */
  def train(df: DataFrame, textCol: String, rounds: Int, topK: Int = 200,
      maxPieceLen: Int = 4): Seq[PieceRound] = {
    val s = df.sparkSession
    import s.implicits._
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(maxPieceLen >= 1 && maxPieceLen <= 8, "maxPieceLen out of range")

    val txt = df.select(col(textCol).as("t")).where(col("t").isNotNull)
    val grams = (1 to maxPieceLen).map { l =>
      txt.filter(length($"t") >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(t) - $l + 1), " +
            s"i -> substring(t, i, $l))")).as("piece"))
    }.reduce(_ unionAll _)
      .groupBy($"piece").agg(count(lit(1)).as("cnt"))
    val top = grams.orderBy($"cnt".desc, $"piece").limit(topK)
    val singles = grams.filter(length($"piece") === 1)
    // bounded collects: <= topK rows and <= |alphabet| rows by construction
    val seedTop = top.collect().map(r => (r.getString(0), r.getLong(1)))
    val alphabet = singles.collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Map[String, Long] = (seedTop ++ alphabet).toMap

    val out = Seq.newBuilder[PieceRound]
    var r = 1
    while (r <= rounds) {
      val vseq = vocab.toSeq.sortBy(_._1)
      val usage = txt
        .select(explode(graft.functions.unigram.viterbiSeg($"t", vseq)
          .getField("pieces")).as("piece"))
        .groupBy($"piece").agg(count(lit(1)).as("n_used"))
        // bounded collect: <= |vocab| distinct pieces by construction
        .collect().map(x => (x.getString(0), x.getLong(1)))
      usage.sortBy(_._1).foreach { case (p, u) =>
        out += PieceRound(r, p, vocab(p), u)
      }
      val used = usage.toMap
      // M-step + prune: used pieces keep their usage weight; unused
      // 1-grams stay at weight 0 (totality); unused multi-grams leave.
      vocab = used ++ alphabet.iterator.collect {
        case (a, _) if !used.contains(a) => a -> 0L
      }
      r += 1
    }
    out.result()
  }
}
