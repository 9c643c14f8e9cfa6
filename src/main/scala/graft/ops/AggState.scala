package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern: keep
  * per-group PARTIAL-AGGREGATE STATE (count / decimal sum / decimal sum of
  * squares / min / max) as a table, fold new data in by merging states, and
  * derive the presentation metrics (mean, variance, …) only at read time.
  * At 100 TB this is the difference between re-scanning the fact table per
  * refresh and touching only the day's increment: `build` runs over the new
  * partition, `merge` folds it into the stored state (cost ∝ |groups|, not
  * |history|), `finalizeState` is a pure projection.
  *
  * Numerics: the state is exact and ORDER-INDEPENDENT — sums run in
  * DECIMAL (fixed precision 38, so build → merge → merge… never changes
  * the schema and never loses a digit; partial-agg order cannot perturb
  * the result, same discipline as [[Profile.correlationMatrix]]). The
  * finalize step is one fixed IEEE expression tree over the exact state —
  * reproducible on any engine. Variance via E[x²]−mean² cancels when
  * |mean| ≫ std (documented trade; [[Profile.zscoreOutliers]] shows the
  * shifted-moment alternative, which is incompatible with state merging
  * because each state would carry a different shift).
  *
  * State schema contract (stable across build and any depth of merging):
  * keyCols ++ (`n` bigint — non-null count, `sum_v` decimal(38,scale),
  * `sumsq_v` decimal(38,2·scale), `min_v` double, `max_v` double).
  */
object AggState {

  private def sumType(scale: Int) = s"decimal(38,$scale)"

  /** Build per-group state from raw rows (run this over the increment,
    * not the history). `scale` fixes the decimal digits kept per value —
    * values are cast to decimal(18,scale) before summing, so it must
    * cover the source column's fractional digits for exactness.
    */
  def build(df: DataFrame, keyCols: Seq[String], valueCol: String,
            scale: Int = 4): DataFrame = {
    require(keyCols.nonEmpty, "aggregate state needs at least one key column")
    val dec = s"decimal(18,$scale)"
    val v = col(valueCol).cast(dec)
    df.groupBy(keyCols.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(v).cast(sumType(scale)).as("sum_v"),
      sum(v * v).cast(sumType(2 * scale)).as("sumsq_v"),
      min(col(valueCol).cast("double")).as("min_v"),
      max(col(valueCol).cast("double")).as("max_v"))
  }

  /** Merge any number of states (stored + increments) into one: counts and
    * decimal sums add, min/max fold — associative and commutative, so a
    * tree of merges equals one big build over the union (exactly, not
    * approximately; asserted in AggStateSpec). One shuffle of the skinny
    * state union on the key.
    */
  def merge(keyCols: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    // mixed-scale states would silently coerce (and round) in the union —
    // reject instead; states meant to merge must share a build scale
    require(states.map(_.schema("sum_v").dataType).distinct.size == 1 &&
      states.map(_.schema("sumsq_v").dataType).distinct.size == 1,
      "all states must share the same decimal scale (same build `scale`)")
    val scaleOf = states.head.schema("sum_v").dataType
      .asInstanceOf[org.apache.spark.sql.types.DecimalType].scale
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(
        coalesce(sum(col("n")).cast("bigint"), lit(0L)).as("n"),
        sum(col("sum_v")).cast(sumType(scaleOf)).as("sum_v"),
        sum(col("sumsq_v")).cast(sumType(2 * scaleOf)).as("sumsq_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Presentation projection over a state: mean and sample variance —
    * one fixed IEEE expression tree over the exact decimal state, NOT
    * rounded (rounding a ~1e10-magnitude double to k decimals is itself
    * implementation-divergent across engines: multiply-by-10^k overflows
    * the 53-bit mantissa). Engines that cast the decimal state to double
    * with a single correct rounding (Java BigDecimal; SQL engines via a
    * string round-trip) replay it bit-exactly — q96's oracle does. Pure
    * projection, zero shuffles. Groups whose rows were all NULL report
    * null metrics; variance is null at n ≤ 1.
    */
  def finalizeState(state: DataFrame, keyCols: Seq[String]): DataFrame = {
    val n = col("n").cast("double")
    val s = col("sum_v").cast("double")
    val ss = col("sumsq_v").cast("double")
    state.select(keyCols.map(col) ++ Seq(
      col("n"),
      when(col("n") > 0, s / n).as("mean_v"),
      when(col("n") > 1, (ss - s * s / n) / (n - lit(1.0))).as("var_v"),
      col("min_v"), col("max_v")): _*)
  }
}
