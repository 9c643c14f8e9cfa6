package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the ANALYZE-style pass a pipeline runs before
  * deciding partitioning, skew handling, and quality gates on a new corpus.
  */
object Profile {

  /** Per-column numeric profile: row count, nulls, exact distinct count,
    * min/max — one row per profiled column.
    *
    * Plan shape: ONE aggregation statement for all columns. Spark plans the
    * k distinct aggregates with a single Expand (each input row fans to k
    * tagged rows, map-side combined), so the input is scanned once —
    * instead of k separate jobs. min/max/count piggyback on the same pass.
    * The result is k tiny structs exploded into rows on the driver side of
    * the agg — no second shuffle.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n"),
          (col("__n") - col(s"__cnt_$c")).as("n_null"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"))
      }: _*)).as("__s"))
      .select(col("__s.*"))
  }

  /** Fixed-bin histogram: bin i covers [lo + i·width, lo + (i+1)·width),
    * values ≥ the last edge clamp into the final bin, values < lo into bin
    * 0. Fixed (not data-derived) edges keep the computation one pure
    * projection + one agg AND make results reproducible across engines —
    * floor of an IEEE division is exact everywhere.
    */
  def fixedHistogram(df: DataFrame, c: String, lo: Double, width: Double,
                     nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "width and nBins must be positive")
    val bin = greatest(lit(0L),
      least(floor((col(c) - lo) / width).cast("long"), lit(nBins - 1L)))
    df.filter(col(c).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
