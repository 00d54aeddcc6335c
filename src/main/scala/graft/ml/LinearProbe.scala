package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Libm-free logistic-style linear classifier ("linear probe") trained by
  * batch gradient descent — the model-based quality-filtering step of a
  * training-data pipeline: fit a small supervised probe over cheap
  * document features, score the corpus, keep the high-scoring tail.
  *
  * Determinism contract (module discipline): the activation is the
  * ALGEBRAIC fast sigmoid σ(m) = 0.5 + 0.5·m/(1+|m|) — same range and
  * monotonicity as the logistic function but no exp in the data path,
  * so no engine/libm ulp divergence exists anywhere. Every per-row
  * gradient term is rounded to 9 dp and DECIMAL-summed; each weight
  * update is then a single double expression over exact aggregates.
  * Fitted weights are therefore bit-identical under any partitioning,
  * cluster size, or engine — the q160 gate replays the whole training
  * loop in DuckDB and hash-compares scores.
  *
  * Scale: one GD round = one scan + one (d+1)-cell aggregate with
  * map-side partials; only d+1 doubles reach the driver per round (the
  * KMeans.fit shape — model as literals, data never moves). Rounds are
  * O(iters) driver-synchronized jobs, exactly like Lloyd iterations.
  */
object LinearProbe {

  private val G = DecimalType(28, 9)

  /** Fast sigmoid of a margin column, rounded to 9 dp (the per-row
    * contract every downstream sum relies on). */
  def sigmoidCol(m: Column): Column =
    round(lit(0.5) + lit(0.5) * m / (lit(1.0) + abs(m)), 9)

  final case class Model(weights: Array[Double], bias: Double) {
    def dims: Int = weights.length

    /** Affine margin w·x + b as a left-assoc fold in index order —
      * the oracle writes the same chain, so doubles match bit-for-bit. */
    def marginCol(features: Column): Column =
      weights.zipWithIndex.foldLeft(lit(bias): Column) { case (acc, (w, j)) =>
        acc + lit(w) * element_at(features, j + 1)
      }

    /** Probe score in (0, 1). */
    def scoreCol(features: Column): Column = sigmoidCol(marginCol(features))
  }

  /** Fit `iters` full-batch GD rounds at fixed learning rate `lr`,
    * starting from zero weights. `featuresCol` must be array<double> of
    * `dims` entries (standardize features to O(1) magnitudes — the 9 dp
    * gradient rounding assumes them); `labelCol` is 0/1 (any numeric). */
  def fitGD(df: DataFrame, featuresCol: String, labelCol: String,
            dims: Int, lr: Double, iters: Int): Model = {
    require(dims > 0 && iters >= 0 && lr > 0,
      s"need dims > 0, iters >= 0, lr > 0; got $dims/$iters/$lr")
    var model = Model(Array.fill(dims)(0.0), 0.0)
    for (_ <- 0 until iters) {
      val err = model.scoreCol(col(featuresCol)) - col(labelCol).cast("double")
      val aggs = (0 until dims).map { j =>
        sum(round(err * element_at(col(featuresCol), j + 1), 9).cast(G)).as(s"g$j")
      } ++ Seq(sum(round(err, 9).cast(G)).as("gb"), count(lit(1)).as("n"))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = r.getLong(dims + 1).toDouble
      val w = model.weights.clone()
      for (j <- 0 until dims)
        w(j) = w(j) - lr * r.getDecimal(j).doubleValue() / n
      model = Model(w, model.bias - lr * r.getDecimal(dims).doubleValue() / n)
    }
    model
  }
}
