package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus deduplication operators: not analysis queries but the
  * `DataFrame => DataFrame` transformations a training-data pipeline runs —
  * each returns the deduplicated corpus with a deterministic canonical
  * survivor (min id) per duplicate group.
  *
  * Scale shapes: exact dedup is one hash shuffle on the content hash;
  * near-dup finds candidate PAIRS sub-quadratically (banded LSH — only
  * documents agreeing on a band signature ever meet), then resolves groups
  * with distributed min-id label propagation over the pair graph. Nothing
  * is collected to the driver at any stage, so every path here survives a
  * pair list (or corpus) far bigger than one machine.
  */
object Dedup {

  /** Exact dedup on a content hash; survivor = min of `idCol`. */
  def exact(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val h = md5(concat_ws(" ", contentCols.map(col): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(h).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Connected components of an undirected edge list, as (`__id`, `__lbl`)
    * where `__lbl` is the component's minimum id.
    *
    * Iterative min-id label propagation with pointer jumping: each round
    * every node takes the minimum of its own label, its neighbors' labels,
    * and its current label's label (the shortcut that makes a length-d
    * chain resolve in O(log d) rounds instead of O(d)). Near-dup groups
    * are dense (duplicates of one source all pair with each other), so a
    * handful of rounds is typical even on chain-shaped graphs. Each
    * materialized round stacks TWO propagation layers (each two shuffle
    * joins + one partial aggregate) before one lazy `localCheckpoint`
    * whose convergence count drives the same job — so each
    * driver-synchronized barrier advances the fixpoint twice;
    * checkpointing truncates the lineage so round N does not replay
    * rounds 1..N-1. Only ids touched by an edge appear in the output
    * (isolated nodes are their own trivial component).
    *
    * Capped at `maxIters` rounds as a runaway guard. Hitting the cap
    * before convergence throws rather than silently under-merging: a
    * partially-propagated labeling looks exactly like a valid one, so a
    * silent cap would corrupt dedup output (and any oracle comparison)
    * invisibly. Real near-dup graphs converge in 2–4 rounds; a 50-round
    * diameter means the input is not a dedup pair graph.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // localCheckpoint persists an RDD per round; without explicit cleanup
    // every superseded round's labels stay pinned in the block manager
    // until a driver GC, competing with the job for memory at exactly the
    // corpus sizes this loop exists for. Ownership is identified by
    // walking the checkpointed frame's own RDD lineage to its persisted
    // ancestors — never by diffing global persistent-RDD state, which
    // would race with concurrent jobs and free THEIR checkpoints.
    def tracked(df: DataFrame, eager: Boolean = true): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint(eager)
      def persisted(r: org.apache.spark.rdd.RDD[_]): Seq[org.apache.spark.rdd.RDD[_]] =
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) Seq(r)
        else r.dependencies.flatMap(d => persisted(d.rdd))
      (out, persisted(out.queryExecution.toRdd).distinct)
    }
    def free(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
      rdds.foreach(_.unpersist(blocking = false))

    // materialize the pair list once BEFORE symmetrizing: both branches
    // of the union would otherwise recompute the caller's candidate
    // pipeline (banded joins, signature aggs) in full. The symmetric view
    // itself stays lazy — a union of the checkpointed blocks with their
    // column swap is a narrow re-read, not worth a second materialization.
    val (p0, edgeIds) = tracked(
      pairs.select(col(aCol).as("__src"), col(bCol).as("__dst")))
    val edges = p0.union(p0.select($"__dst".as("__src"), $"__src".as("__dst")))
    // round 0 fused into initialization: label(v) = min(v, min neighbor)
    // is one groupBy over the symmetric edge list — no join, and it both
    // enumerates the node set and completes the first propagation round
    var (labels, labelIds) = tracked(
      edges.groupBy($"__src").agg(min($"__dst").as("__m"))
        .select($"__src".as("__id"), least($"__src", $"__m").as("__lbl")))
    // One propagation layer over (__id, __lbl, __prev): each node takes the
    // minimum of its own label, its neighbors' labels, and — pointer
    // jumping — its label's own label. The jump branch is what makes
    // convergence O(log diameter) instead of O(diameter): a node's reach
    // doubles each layer by adopting whatever its current representative
    // has already learned. Both invariants that make the shortcut safe
    // hold inductively: every label IS a node id of the same component
    // (so the jump join always finds a row and never crosses components),
    // and lbl(u) <= u (so jumping only ever lowers a label, never raises
    // it). __prev (the label at round entry) rides the __own-tagged union
    // branch untouched, so after stacking layers the round compares
    // first-to-last: labels only decrease, hence __lbl < __prev iff ANY
    // stacked layer changed this node.
    def layer(cur: DataFrame): DataFrame = {
      val lab = cur.select($"__id", $"__lbl")
      val nullPrev = lit(null).cast(cur.schema("__prev").dataType)
      val nbr = edges.join(lab, $"__dst" === $"__id")
        .select($"__src".as("__nid"), $"__lbl", nullPrev.as("__prev"),
          lit(false).as("__own"))
      val jump = lab.as("x")
        .join(lab.select($"__id".as("__jid"), $"__lbl".as("__jlbl")),
          $"x.__lbl" === $"__jid")
        .select($"x.__id".as("__nid"), $"__jlbl".as("__lbl"),
          nullPrev.as("__prev"), lit(false).as("__own"))
      cur.select($"__id".as("__nid"), $"__lbl", $"__prev", lit(true).as("__own"))
        .union(nbr).union(jump)
        .groupBy($"__nid")
        .agg(min($"__lbl").as("__lbl"),
          min(when($"__own", $"__prev")).as("__prev"))
        .select($"__nid".as("__id"), $"__lbl", $"__prev")
    }
    var converged = false
    var iter = 1 // initialization already performed round 1
    while (!converged && iter < maxIters) {
      // two layers per materialized round: each checkpoint + convergence
      // check is a driver-synchronized job, so stacking layers halves the
      // number of round-trip barriers (the dominant per-round cost both
      // here and on a real cluster) at the price of at most one redundant
      // layer after the fixpoint. Convergence detection is plain column
      // comparison on the label's own type: it works identically for
      // long, string (UUID), or any orderable id type, where a numeric
      // cast would turn string labels into NULLs and declare convergence
      // after one round (silent under-merge).
      val stacked = layer(layer(labels.withColumn("__prev", $"__lbl")))
      val (next, nextIds) = tracked(
        stacked.select($"__id", $"__lbl",
          // every __nid has exactly one __own row, so __prev is only
          // null for a node absent from `labels` — impossible here, but
          // count it as changed rather than converged if it ever happens
          coalesce(($"__lbl" < $"__prev").cast("long"), lit(1L)).as("__chg")),
        eager = false)
      // lazy checkpoint: this one aggregate job BOTH materializes the
      // round's labels into the block manager AND returns the changed
      // count — one job per round, not materialize + re-scan
      val changed = next.agg(coalesce(sum($"__chg"), lit(0L)))
        .collect()(0).getLong(0)
      converged = changed == 0L
      free(labelIds)
      labels = next
      labelIds = nextIds
      iter += 1
    }
    free(edgeIds) // frees p0 — the returned frame depends only on the final checkpoint
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds; raise " +
          "maxIters — returning would silently under-merge components")
    labels.select($"__id", $"__lbl")
  }

  /** Ids to drop (everything but the min-id survivor of each component). */
  private def dupIds(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    import pairs.sparkSession.implicits._
    connectedComponents(pairs, aCol, bCol)
      .filter($"__lbl" < $"__id")
      .select($"__id".as("__dup"))
  }

  /** Near-dup dedup via MinHash+LSH over word shingles of `textCol`.
    *
    * Candidate pairs: documents sharing >= `minBands` of `bands` salted
    * min-hash band signatures over `shingleLen`-gram shingles. Groups are
    * the connected components of the candidate-pair graph; each group
    * keeps its min-id row. Fully distributed: banded candidate join, then
    * label propagation — no driver-side pair list.
    */
  def nearMinhash(df: DataFrame, idCol: String, textCol: String,
                  shingleLen: Int = 3, bands: Int = 8, minBands: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val toks = split(col(textCol), " ")
    val sh = df
      .select(col(idCol).as("__id"), toks.as("__toks"))
      .filter(size($"__toks") >= shingleLen)
      .select($"__id", explode(array_distinct(expr(
        s"transform(sequence(1, size(__toks)-${shingleLen - 1}), i -> " +
          s"concat_ws(' ', ${(0 until shingleLen).map(o => s"element_at(__toks, i+$o)").mkString(", ")}))"
      ))).as("__shingle"))

    // one md5 per shingle; band hashes are overlapping digest windows
    // (see queries.TextDedupQueries q27 — full recall at 8x fewer digests)
    val salted = array((0 until bands).map(b =>
      substring(md5($"__shingle"), b * 2 + 1, 16)): _*)
    val sig = sh
      .select($"__id", posexplode(salted).as(Seq("__band", "__mh")))
      .groupBy($"__id", $"__band")
      .agg(min($"__mh").as("__mh"))

    val pairs = sig.as("a").join(sig.as("b"),
        $"a.__band" === $"b.__band" && $"a.__mh" === $"b.__mh" &&
          $"a.__id" < $"b.__id")
      .groupBy($"a.__id".as("ida"), $"b.__id".as("idb"))
      .agg(count(lit(1)).as("nb"))
      .filter($"nb" >= minBands)
      .select($"ida", $"idb")

    df.join(dupIds(pairs, "ida", "idb"), col(idCol) === col("__dup"), "left_anti")
  }

  /** Near-dup dedup on embedding cosine >= `threshold`; same group/survivor
    * semantics.
    *
    * Candidate generation is banded sign-bit LSH (the q30 bucketer,
    * band-ized): band `b`'s signature is the sign pattern of dims
    * [b·bandBits, (b+1)·bandBits); vectors meet iff they agree on at least
    * one full band, then the EXACT cosine decides. Recall for a pair at
    * angle θ is 1-(1-(1-θ/π)^bandBits)^bands — with the 16×4 default and
    * 64-dim vectors: ≈0.94 at cos 0.4, ≈1 at cos ≥ 0.8 (the dedup regime).
    * Raise `bandBits` (fewer, bigger bands) for selectivity at corpus
    * scale; the shape — shuffle on (band, signature), never all-pairs —
    * is what survives 100×. Dims beyond bands·bandBits don't contribute to
    * bucketing (cosine still uses them); vectors shorter than bands·bandBits
    * hash their missing dims as sign-0 (vector.signBits bounds-checks, so
    * short vectors never throw under ANSI mode).
    */
  def nearCosine(df: DataFrame, idCol: String, vecCol: String,
                 threshold: Double, bands: Int = 16, bandBits: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__nrm", graft.functions.vector.norm($"__v"))
    val sigs = array((0 until bands).map { b =>
      graft.functions.vector.signBits($"__v", b * bandBits, bandBits)
    }: _*)
    val banded = base.select($"__id", $"__v", $"__nrm",
      posexplode(sigs).as(Seq("__band", "__sig")))
    val pairs = banded.as("a").join(banded.as("b"),
        $"a.__band" === $"b.__band" && $"a.__sig" === $"b.__sig" &&
          $"a.__id" < $"b.__id")
      .select($"a.__id".as("ida"), $"b.__id".as("idb"),
        $"a.__v".as("va"), $"b.__v".as("vb"),
        $"a.__nrm".as("na"), $"b.__nrm".as("nb"))
      .dropDuplicates("ida", "idb") // a pair may agree on several bands
      .filter(graft.functions.vector.dot($"va", $"vb") / ($"na" * $"nb") >= threshold)
      .select($"ida", $"idb")

    df.join(dupIds(pairs, "ida", "idb"), col(idCol) === col("__dup"), "left_anti")
  }
}
