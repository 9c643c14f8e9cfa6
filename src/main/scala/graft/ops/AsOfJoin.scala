package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward and forward) — for each left row, the nearest
  * right row at-or-before ([[AsOfJoin.backward]]) / at-or-after
  * ([[AsOfJoin.forward]]) its timestamp for the same key, with an
  * optional tolerance. Spark has no native ASOF operator; the classic
  * scalable composition (preference (a) of the custom-operator ladder:
  * compose built-ins) is the UNION + LAST_VALUE trick:
  *
  *   1. union both sides, tagged (right rows sorted before left rows at
  *      equal timestamps, making the match inclusive);
  *   2. one window pass per key ordered by (time, tag) carries the latest
  *      right payload forward;
  *   3. keep left rows.
  *
  * Cost: ONE shuffle on the key + a sort within partitions — same price as
  * a sort-merge join, with no range-condition explosion (a naive
  * `t2 <= t1` join is O(n·m) per key). This is the shape that survives
  * 100 TB event tables; a custom SparkPlan would only remove the union
  * column padding.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param key        equality key column name (present in both)
    * @param leftTime   left event-time column name (orderable)
    * @param rightTime  right event-time column name (same type)
    * @param rightCols  right payload columns to carry (renamed as-is onto
    *                   the result; null when no right row precedes)
    * @param tolerance  max allowed `leftTime - rightTime`; a match farther
    *                   back nulls out (pandas merge_asof's tolerance).
    *                   Requires numeric time columns.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightCols,
      lookForward = false, tolerance)

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` (inclusive) for the same key: the
    * next-event/scheduling complement of [[backward]] (first purchase
    * after signup, next maintenance window after an alert). Same
    * union + one-window-pass composition, same single-shuffle cost — the
    * window just looks FORWARD, carrying the first non-null right payload
    * back onto earlier left rows. `tolerance` bounds
    * `rightTime - leftTime`.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightCols,
      lookForward = true, tolerance)

  private def asOf(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String], lookForward: Boolean,
                   tolerance: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.contains(key), "rightCols must exclude the key")
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns must not collide with left columns " +
        s"(rename first): ${rightCols.intersect(leftCols).mkString(",")}")

    // tag ordering makes equal timestamps INCLUSIVE in both directions:
    // backward keeps right rows before left at equal __t, forward after
    val (rightTag, leftTag) = if (lookForward) (1, 0) else (0, 1)
    // the matched right row's own time rides along as __rt (tolerance)
    val taggedRight = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(rightTag).as("__tag") +:
        col(rightTime).as("__rt") +:
        rightCols.map(col) ++: leftCols.filterNot(c => c == key)
          .map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(leftTag).as("__tag") +:
        lit(null).as("__rt") +:
        rightCols.map(c => lit(null).as(c)) ++: leftCols.filterNot(c => c == key)
          .map(col)): _*)

    val w = {
      val base = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      if (lookForward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def carry(df: DataFrame, c: String): DataFrame =
      if (lookForward) df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
      else df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    val carried = ("__rt" +: rightCols)
      .foldLeft(taggedRight.unionByName(taggedLeft))(carry)

    val matched = carried.filter(col("__tag") === leftTag)
    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        val gap = if (lookForward) col("__rt") - col("__t")
                  else col("__t") - col("__rt")
        val inTol = col("__rt").isNotNull && gap <= tol
        rightCols.foldLeft(matched)((df, c) =>
          df.withColumn(c, when(inTol, col(c))))
    }
    gated.select((col(key) +: leftCols.filterNot(_ == key).map(col)
      ++: rightCols.map(col)): _*)
  }
}
