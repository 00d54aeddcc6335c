package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication operators: not analysis queries but the
  * `DataFrame => DataFrame` transformations a training-data pipeline runs —
  * each returns the deduplicated corpus with a deterministic canonical
  * survivor (min id) per duplicate group.
  *
  * Scale shapes: exact dedup is one hash shuffle on the content hash;
  * near-dup finds candidate PAIRS sub-quadratically (MinHash banding — only
  * documents agreeing on a band signature meet), then resolves groups with
  * union-find over the pair list. The pair list is orders of magnitude
  * smaller than the corpus (it is near-dup pairs, not all pairs), so the
  * union-find runs driver-side and broadcasts its verdict — the same
  * asymmetry broadcast joins exploit. At a pair list too big for one
  * machine the upgrade is iterative label propagation (min-id exchange
  * until fixpoint), same group semantics.
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

  /** Near-dup dedup via MinHash+LSH over word shingles of `textCol`.
    *
    * Candidate pairs: documents sharing >= `minBands` of `bands` salted
    * min-hash band signatures over `shingleLen`-gram shingles. Groups are
    * the connected components of the candidate-pair graph; each group
    * keeps its min-id row.
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
      .as[(Long, Long)]
      .collect()

    // union-find over the (small) near-dup pair list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canonical = parent.keys.map(k => k -> find(k)).filter { case (k, r) => k != r }.toSeq

    if (canonical.isEmpty) df
    else {
      val dupIds = canonical.map(_._1).toDF("__dup")
      df.join(broadcast(dupIds), col(idCol) === col("__dup"), "left_anti")
    }
  }

  /** Near-dup dedup on embedding cosine >= `threshold`; same group/survivor
    * semantics. Brute-force kernel — pair with an LSH/IVF bucketer first at
    * scale (see queries.VectorQueries.q30). */
  def nearCosine(df: DataFrame, idCol: String, vecCol: String,
                 threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val normed = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__nrm", graft.functions.vector.norm($"__v"))
      .as[(Long, Array[Double], Double)]
      .collect().sortBy(_._1)
    val ids = normed.map(_._1); val vs = normed.map(_._2); val ns = normed.map(_._3)

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        var acc = 0.0; var d = 0
        while (d < vs(i).length) { acc += vs(i)(d) * vs(j)(d); d += 1 }
        if (acc / (ns(i) * ns(j)) >= threshold) {
          val (ra, rb) = (find(ids(i)), find(ids(j)))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        j += 1
      }
      i += 1
    }
    val dups = parent.keys.map(k => k -> find(k)).filter { case (k, r) => k != r }
      .map(_._1).toSeq
    if (dups.isEmpty) df
    else df.join(broadcast(dups.toDF("__dup")), col(idCol) === col("__dup"), "left_anti")
  }
}
