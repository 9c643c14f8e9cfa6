package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval (range) join.
  *
  * Spark has no native range-join optimization: a bare
  * `points JOIN ranges ON t >= start AND t < end` plans as
  * BroadcastNestedLoopJoin — O(|points|·|ranges|) comparisons, the first
  * thing that dies at scale. The standard distributed fix, implemented
  * here, is INTERVAL BINNING: quantize time into fixed bins, explode each
  * range over the bins it overlaps, equi-join points to ranges on the bin,
  * then apply the exact bounds. The join becomes a hash shuffle on bin
  * with per-bin fan-out |points∩bin| × |ranges∩bin| — local density, not
  * global cross product.
  *
  * Correctness: a point lies in exactly ONE bin, so a (point, range) match
  * survives exactly once — no dedup pass needed. Bins are integer floor
  * divisions of exact integer timestamps (micros throughout this repo) —
  * engine-reproducible.
  *
  * Choosing binWidth: ~ the typical range length. Much smaller → ranges
  * explode over many bins (row blow-up on the ranges side); much larger →
  * bins pair too many points×ranges (verify blow-up). Both failure modes
  * are linear and visible, never quadratic in corpus size.
  */
object RangeJoin {

  /** Join `points` (integer timestamp `pointTs`) to `ranges`
    * ([`startCol`, `endCol`) half-open, same integer timescale): returns
    * all columns of both inputs for every point falling in a range.
    * Column names must be disjoint between the two inputs.
    */
  def pointsInRanges(points: DataFrame, pointTs: String,
                     ranges: DataFrame, startCol: String, endCol: String,
                     binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointTs) / binWidth).cast("long"))
    val r = binExplode(ranges, startCol, endCol, binWidth)
    p.join(r, "__bin")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }

  /** One row per (range, overlapped bin): a half-open range [s, e)
    * covers bins floor(s/w)..floor((e-1)/w); empty ranges (e <= s)
    * produce no bins and silently drop. Shared by both join flavors so
    * the binning arithmetic can never diverge between them.
    */
  private def binExplode(df: DataFrame, startCol: String, endCol: String,
                         binWidth: Long): DataFrame = df
    .withColumn("__bins",
      when(col(endCol) > col(startCol),
        sequence(floor(col(startCol) / binWidth).cast("long"),
          floor((col(endCol) - 1) / binWidth).cast("long")))
        .otherwise(typedLit(Seq.empty[Long])))
    .withColumn("__bin", explode(col("__bins"))).drop("__bins")

  /** Interval×interval OVERLAP join: every (left, right) pair whose
    * half-open intervals have a NONEMPTY intersection — for two nonempty
    * intervals that is `lStart < rEnd AND rStart < lEnd`; an empty
    * interval (end <= start) intersects nothing and never matches, even
    * when its point lies strictly inside the other interval. The naive
    * spelling is a BroadcastNestedLoopJoin like the point case; here BOTH
    * sides explode over the bins they cover and equi-join on bin.
    *
    * Exactly-once without a dedup pass: a pair sharing k bins would match
    * k times, so the join keeps a pair ONLY in the bin containing the
    * overlap's first instant `max(lStart, rStart)` — an instant inside
    * both intervals, hence a bin both sides cover, and unique per pair.
    * (The same ownership trick DB range-join implementations use; no
    * distinct shuffle over the matched pairs.)
    *
    * Column names must be disjoint between the two inputs; binWidth as in
    * [[pointsInRanges]] — ~ the typical interval length.
    */
  def intervalOverlaps(left: DataFrame, lStart: String, lEnd: String,
                       right: DataFrame, rStart: String, rEnd: String,
                       binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    binExplode(left, lStart, lEnd, binWidth)
      .join(binExplode(right, rStart, rEnd, binWidth), "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(floor(greatest(col(lStart), col(rStart)) / binWidth)
        .cast("long") === col("__bin"))
      .drop("__bin")
  }
}
