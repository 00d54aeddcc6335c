package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of joins: attach to each left row the latest right row with
  * `rightTime <= leftTime` (backward — trades-to-latest-quote, the
  * canonical market-data join) or the earliest right row with
  * `rightTime >= leftTime` (forward — trade-to-next-quote / "time to next
  * event"), per key.
  *
  * Implementation is the union trick, per SURVEY §7.6's "compose existing
  * ops" preference: tag both sides, union, one window per key ordered by
  * (time, side) with `last`/`first(value, ignoreNulls)` carrying the
  * nearest right attributes across, then keep left rows. Cost: ONE shuffle
  * on the key + a sort — no range join, no per-key explosion, skew-safe
  * under AQE. A right row at exactly leftTime wins in BOTH directions (the
  * side tag places it inside the frame at equal times).
  *
  * Right-side grain must be unique per (key, time) — pre-aggregate if not
  * (ties would make "the" nearest row ambiguous in any engine).
  */
object AsOfJoin {

  /** Latest right row at or before each left row's time.
    * @param rightCols right-side columns to carry (renamed as given) */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Map[String, String]): DataFrame =
    asof(left, right, key, time, rightCols, fwd = false)

  /** Earliest right row at or after each left row's time. */
  def forward(left: DataFrame, right: DataFrame, key: String, time: String,
              rightCols: Map[String, String]): DataFrame =
    asof(left, right, key, time, rightCols, fwd = true)

  private def asof(left: DataFrame, right: DataFrame, key: String, time: String,
                   rightCols: Map[String, String], fwd: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // A destination name colliding with a left column would silently null
    // out that left column (withColumn replaces), then the carry window
    // would destroy the left data. Refuse instead.
    val collisions = rightCols.values.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"rightCols destination names collide with left columns: $collisions")
    // side tags order the union so that at EQUAL times the right row falls
    // inside the left row's frame: right before left (0 < 1) for the
    // backward-looking frame, right after left (2 > 1) when looking forward
    val rightSide = if (fwd) 2 else 0
    val taggedLeft = rightCols.values.foldLeft(
      left.withColumn("__side", lit(1))) { case (df, c) =>
      df.withColumn(c, lit(null))
    }
    val taggedRight = leftCols.filterNot(c => c == key || c == time).foldLeft(
      right.select(Seq(col(key), col(time)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) }: _*)
        .withColumn("__side", lit(rightSide))) { case (df, c) =>
      df.withColumn(c, lit(null))
    }

    val unioned = taggedLeft.select(
      (leftCols ++ rightCols.values.toSeq :+ "__side").map(col): _*)
      .unionByName(taggedRight.select(
        (leftCols ++ rightCols.values.toSeq :+ "__side").map(col): _*))

    val base = Window.partitionBy(col(key)).orderBy(col(time), col("__side"))
    val w =
      if (fwd) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(c: Column): Column =
      if (fwd) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)

    rightCols.values.foldLeft(unioned) { case (df, c) =>
        df.withColumn(c, carry(col(c)))
      }
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
