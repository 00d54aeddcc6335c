package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE VOCABULARY TRAINING — the iterative merge-learning loop of
  * tokenizer induction (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): k rounds of
  * {count adjacent pairs corpus-wide → adopt the best pair → advance the
  * corpus by one merge pass}, producing the rank-ordered rule table the
  * encode operators (q213 [[org.apache.spark.sql.graft.BpeEncode]] /
  * q245 [[org.apache.spark.sql.graft.BpeEncodeMulti]] / q318 fertility)
  * consume. q144 mines exactly ONE round of this loop; this is the loop.
  *
  * SEMANTIC CONTRACT (pinned so an oracle can replay it):
  *  - training state is INCREMENTAL: state_r = one left-to-right
  *    [[org.apache.spark.sql.graft.BpeMergePass]] of rule_r over
  *    state_{r-1} (the textbook trainer — earlier ranks are never
  *    re-searched, unlike best-first ENCODING, which may differ exactly
  *    when a later merge re-creates an earlier rule's side by token
  *    collision);
  *  - self-pairs (a = b) are excluded from candidates — the sibling
  *    encoders' contract: with a ≠ b, occurrences cannot overlap, so
  *    pass order is immaterial and merges-applied = pairs-counted;
  *  - the adoption tie rule is (count DESC, a ASC, b ASC), realized
  *    distributively as min(struct(-cnt, a, b));
  *  - merged tokens are plain concatenations a+b, so rule sides may
  *    themselves be merged tokens in later rounds — the loop is
  *    genuinely multi-level.
  *
  * SCALE SHAPE (100 TB): per round exactly ONE data-sized shuffle — the
  * pair count, map-side combinable on the (a, b) key — feeding a 1-row
  * global aggregate; the driver sees ONE bounded row per round (the
  * argmax + candidate-table stats), never the pair table. The corpus
  * state is k stacked merge-pass projections over the once-materialized
  * token corpus: Catalyst's CollapseProject fuses them into a single
  * compiled pass per round's job, zero extra shuffle. At cluster scale
  * re-materialize (checkpoint) the state every ~8 rounds so round r
  * recomputes O(8), not O(r), passes; at gate k the recompute is cheaper
  * than the write, so only the base is pinned.
  */
object BpeTrain {

  /** One adopted merge rule with its adoption-time evidence: the pair
    * count that won the round, plus the candidate-table witnesses
    * (distinct adjacent pairs and total adjacent-pair occurrences in
    * the round's corpus state) that pin the whole state, not just the
    * argmax. */
  final case class Learned(round: Int, a: String, b: String, cnt: Long,
      nPairs: Long, totPairs: Long)

  /** Learns up to `rounds` merge rules from `base` (must contain
    * `tokensCol`: array<string> — whitespace-split corpus words; tokens
    * must not be null-element arrays at positions that should merge).
    * Stops early if no a ≠ b adjacent pair remains.
    *
    * @return the learned rules in adoption order (rank = round), and the
    *         final corpus state as a DataFrame (base columns with
    *         `tokensCol` replaced by the trained tokenization) for
    *         downstream re-encoding audits
    */
  def train(base: DataFrame, tokensCol: String, rounds: Int): (Seq[Learned], DataFrame) = {
    val s = base.sparkSession
    import s.implicits._
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // Pin the tokenized corpus once: every round scans this, through the
    // stacked (Catalyst-collapsed) merge passes learned so far.
    val pinned = base.localCheckpoint(true)
    var cur = pinned
    val out = Seq.newBuilder[Learned]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val w = col(tokensCol)
      val best: Row = cur
        .where(size(w) >= 2)
        .select(explode(expr(
          s"transform(sequence(1, size($tokensCol) - 1), " +
            s"i -> struct($tokensCol[i-1] AS a, $tokensCol[i] AS b))")).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
        .where($"a" =!= $"b" && $"a".isNotNull && $"b".isNotNull)
        .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
        // argmax with the pinned tie rule (cnt DESC, a ASC, b ASC) as a
        // partial-combinable MIN over struct(-cnt, a, b): one reduce to
        // one row, no global sort
        .agg(min(struct((-$"cnt").as("nc"), $"a", $"b")).as("best"),
          count(lit(1)).as("n_pairs"), coalesce(sum($"cnt"), lit(0L)).as("tot_pairs"))
        .collect()(0)                       // bounded: exactly 1 row per round
      if (best.isNullAt(0)) exhausted = true
      else {
        val b0 = best.getStruct(0)
        val rule = Learned(r, b0.getString(1), b0.getString(2), -b0.getLong(0),
          best.getLong(1), best.getLong(2))
        out += rule
        cur = cur.withColumn(tokensCol,
          graft.functions.bpe.mergePass(w, rule.a, rule.b))
        r += 1
      }
    }
    (out.result(), cur)
  }
}
