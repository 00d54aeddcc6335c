package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the library form of the
  * q142 gate (graft.queries.CorpusModelQueries), shaped the way MLlib
  * ships it: the model (k·dims doubles) lives on the driver and enters
  * each round as literals inside a codegen'd expression, so per-iteration
  * cost is one scan + one (cluster, dim)-keyed aggregate and the data
  * itself never moves. Semantic clustering is the backbone of
  * cluster-balanced sampling and centroid-routed IVF (VectorQueries q59).
  *
  * Scale: the assignment pass is embarrassingly parallel (k·dims
  * multiply-adds per row, no shuffle); the update pass shuffles k·dims
  * partial (sum, count) pairs per partition — independent of row count.
  * Only centroids (k·dims·8 bytes) ever reach the driver, once per
  * round. At 100 TB with k=1024, d=1024 that is 8 MB — still trivial.
  *
  * Determinism: init is the k smallest-id vectors; per-row distance is a
  * sequential left fold in dimension order; the update sum is the one
  * accumulation-order-dependent step (plain double sums across rows), so
  * unlike the gate's decimal-exact relational form, refitting under a
  * different partitioning can flip a near-tied argmin. Callers that need
  * bit-stable labels across reruns persist the model, not the labels.
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length

    /** Index of the nearest centroid (squared L2, lowest index wins
      * ties): a single codegen'd expression over the array column. */
    def assignCol(vecCol: Column): Column = {
      val dists = centroids.zipWithIndex.map { case (c, j) =>
        val carr = array(c.map(lit(_)).toIndexedSeq: _*)
        val d = aggregate(
          zip_with(vecCol.cast("array<double>"), carr,
            (x, cv) => (x - cv) * (x - cv)),
          lit(0.0), (acc, t) => acc + t)
        struct(d, lit(j))
      }
      // struct() auto-names the fields col1/col2 (the alias is not yet
      // resolved at construction time); cast to a named struct instead
      // (least() needs >= 2 args, so k=1 short-circuits to cluster 0)
      if (dists.length == 1) lit(0)
      else least(dists.toIndexedSeq: _*).cast("struct<d:double,j:int>").getField("j")
    }

    /** Mean squared distance to the assigned centroid — the Lloyd
      * objective; strictly non-increasing across fit iterations. */
    def inertia(vecs: DataFrame, vecCol: String): Double = {
      val dists = centroids.map { c =>
        val carr = array(c.map(lit(_)).toIndexedSeq: _*)
        aggregate(
          zip_with(col(vecCol).cast("array<double>"), carr,
            (x, cv) => (x - cv) * (x - cv)),
          lit(0.0), (acc, t) => acc + t)
      }
      val nearest = if (dists.length == 1) dists.head
        else least(dists.toIndexedSeq.map(d => d: Column): _*)
      vecs.select(nearest.as("d"))
        .agg(avg(col("d"))).head().getDouble(0)
    }
  }

  /** Fit `iters` Lloyd rounds, seeding from the `k` smallest-`idCol`
    * vectors. A cluster that loses all members keeps its centroid. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): Model = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val seeds = vecs.select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(k).collect()
    require(seeds.length == k, s"k=$k but only ${seeds.length} vectors")
    refine(vecs, vecCol, Model(seeds.map(_.getSeq[Double](1).toArray)), iters)
  }

  /** Fit with deterministic farthest-point (k-center) seeding: seed 1 is
    * the smallest-id vector; each next seed is the vector MAXIMIZING its
    * distance to the nearest already-chosen seed (smallest id on ties).
    * The greedy 2-approximation to the k-center objective — seeds land
    * one per well-separated region, where min-id seeding can start all k
    * inside one cluster and need many Lloyd rounds to escape. Fully
    * deterministic (unlike sampled k-means++), so refits are
    * reproducible across partitionings and cluster sizes.
    *
    * Cost: k-1 distributed argmax jobs (each a TakeOrdered over per-row
    * fold distances — no shuffle beyond the top-1 reduction), then the
    * usual Lloyd rounds. For corpus-scale k (√n), prefer sampling a
    * bounded candidate set first; this exact form is for the dim-table
    * k regime (k in the hundreds). */
  def fitFarthest(vecs: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): Model = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val base = vecs.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val first = base.orderBy(col("__id")).limit(1).collect()
    require(first.nonEmpty, "no vectors to seed from")
    var seeds = Vector(first(0).getSeq[Double](1).toArray)
    while (seeds.length < k) {
      val dists = seeds.map { c =>
        val carr = array(c.map(lit(_)).toIndexedSeq: _*)
        aggregate(zip_with(col("__v"), carr, (x, cv) => (x - cv) * (x - cv)),
          lit(0.0), (acc, t) => acc + t)
      }
      val dmin = if (dists.length == 1) dists.head
        else least(dists.toIndexedSeq.map(d => d: Column): _*)
      val far = base.select(col("__id"), col("__v"), dmin.as("__d"))
        .orderBy(col("__d").desc, col("__id")).limit(1).collect()(0)
      seeds = seeds :+ far.getSeq[Double](1).toArray
    }
    refine(vecs, vecCol, Model(seeds.toArray), iters)
  }

  private def refine(vecs: DataFrame, vecCol: String,
                     init: Model, iters: Int): Model = {
    var model = init
    val dims = model.centroids.head.length
    for (_ <- 0 until iters) {
      // one job per round: explode to (cid, dim) cells, partial-agg
      // map-side, collect exactly k*dims (sum, count) rows
      val sums = vecs
        .select(model.assignCol(col(vecCol)).as("cid"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
        .groupBy(col("cid"), col("i"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = model.centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      model = Model(next)
    }
    require(model.centroids.forall(_.length == dims), "ragged centroids")
    model
  }
}
