package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: attach to each left row the latest right row with
  * `rightTime <= leftTime` per key — trades-to-latest-quote, the canonical
  * market-data join the reference never needed at daily grain.
  *
  * Implementation is the union trick, per SURVEY §7.6's "compose existing
  * ops" preference: tag both sides, union, one window per key ordered by
  * (time, side) with `last(value, ignoreNulls)` carrying the most recent
  * right attributes forward, then keep left rows. Cost: ONE shuffle on the
  * key + a sort — no range join, no per-key explosion, skew-safe under
  * AQE. A right row at exactly leftTime wins (side 0 sorts before side 1).
  *
  * Right-side grain must be unique per (key, time) — pre-aggregate if not
  * (ties would make "the" latest row ambiguous in any engine).
  */
object AsOfJoin {

  /** @param rightCols right-side columns to carry (renamed as given) */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // A destination name colliding with a left column would silently null
    // out that left column (withColumn replaces), then the carry-forward
    // window would destroy the left data. Refuse instead.
    val collisions = rightCols.values.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"rightCols destination names collide with left columns: $collisions")
    val taggedLeft = rightCols.values.foldLeft(
      left.withColumn("__side", lit(1))) { case (df, c) =>
      df.withColumn(c, lit(null))
    }
    val taggedRight = leftCols.filterNot(c => c == key || c == time).foldLeft(
      right.select(Seq(col(key), col(time)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) }: _*)
        .withColumn("__side", lit(0))) { case (df, c) =>
      df.withColumn(c, lit(null))
    }

    val unioned = taggedLeft.select(
      (leftCols ++ rightCols.values.toSeq :+ "__side").map(col): _*)
      .unionByName(taggedRight.select(
        (leftCols ++ rightCols.values.toSeq :+ "__side").map(col): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightCols.values.foldLeft(unioned) { case (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
