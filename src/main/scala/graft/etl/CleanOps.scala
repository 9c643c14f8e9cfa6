package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The absent-`beam.py` food-orders operators the reference documents
  * (`/root/reference/README.md:29-39`; SURVEY.md §2.2 P6/P7):
  * string cleaning and a status split into two output streams.
  */
object CleanOps {

  /** P6 — "removing trailing colons and special characters"
    * (`README.md:34`): trailing-colon strip, then drop everything outside
    * letters/digits/space/basic punctuation.
    */
  def cleanString(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, ":+\\s*$", ""), "[^a-zA-Z0-9 .,-]", ""))

  def cleanColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, cleanString(col(c))))

  /** P7 — split one stream into (matching, rest) by a status predicate
    * (`README.md:35`: delivered vs other). Both branches share one scan
    * (Spark recomputes or reuses via cache at the caller's discretion; the
    * two writes of the covid pipeline use the same fan-out shape).
    */
  def splitByStatus(df: DataFrame, statusCol: String, value: String): (DataFrame, DataFrame) =
    (df.filter(col(statusCol) === value), df.filter(col(statusCol) =!= value))
}
