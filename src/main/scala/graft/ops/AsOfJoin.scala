package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` for the same key. Spark has no native ASOF
  * operator; the classic scalable composition (preference (a) of the
  * custom-operator ladder: compose built-ins) is the UNION + LAST_VALUE
  * trick:
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
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.contains(key), "rightCols must exclude the key")
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns must not collide with left columns " +
        s"(rename first): ${rightCols.intersect(leftCols).mkString(",")}")

    val taggedRight = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
        rightCols.map(col) ++: leftCols.filterNot(c => c == key)
          .map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(1).as("__tag") +:
        rightCols.map(c => lit(null).as(c)) ++: leftCols.filterNot(c => c == key)
          .map(col)): _*)

    // right rows (tag 0) sort before left rows (tag 1) at equal __t: the
    // carried value at a left row includes right rows with __t == leftTime
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select((col(key) +: leftCols.filterNot(_ == key).map(col)
        ++: rightCols.map(col)): _*)
  }
}
