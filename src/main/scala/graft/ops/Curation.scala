package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup/similarity: reproducible
  * sampling and split assignment, sequence-packing statistics, and eval-set
  * decontamination. Every operator is a pure projection/agg plan (no
  * driver-side iteration) and is engine-reproducible so the driver's DuckDB
  * oracle can check it bit-for-bit.
  */
object Curation {

  /** Deterministic bucket in [0, nBuckets): the first 8 hex chars of
    * md5(id) parsed as an integer, mod nBuckets. Properties that matter for
    * a 100 TB corpus:
    *
    *   - REPRODUCIBLE across engines, runs, partitionings and cluster
    *     sizes (pure function of the id — unlike rand() or
    *     monotonically_increasing_id), so train/val membership is stable
    *     when the pipeline re-runs or data is re-partitioned;
    *   - INCREMENTAL: adding new documents never reassigns existing ones;
    *   - UNIFORM: md5's avalanche makes bucket occupancy binomial even for
    *     sequential ids.
    *
    * Codegen'd built-ins only (md5/substring/conv) — no UDF.
    */
  def hashBucket(id: Column, nBuckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % nBuckets

  /** Assign every row a split label ("train"/"val"/"test"/…) from
    * cumulative weight thresholds over [[hashBucket]]. Weights need not sum
    * to 1 — they are normalized. One projection, zero shuffles.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)] =
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                  nBuckets: Int = 10000): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits must have positive weights")
    val total = splits.map(_._2).sum
    val bucket = hashBucket(col(idCol), nBuckets)
    // cumulative integer thresholds; last split absorbs rounding remainder
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * nBuckets)
    }.tail.init
    val labeled = bounds.zip(splits.map(_._1)).foldRight(lit(splits.last._1)) {
      case ((bound, name), rest) => when(bucket < bound, name).otherwise(rest)
    }
    df.withColumn("split", labeled)
  }

  /** Deterministic fractional sample: keep rows whose [[hashBucket]] falls
    * below fraction·nBuckets. Same stability guarantees; composes with a
    * stratum column by just filtering after a groupBy-free projection.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          nBuckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(col(idCol), nBuckets) < math.round(fraction * nBuckets))
  }

  /** Concat-and-chunk sequence-packing statistics (the GPT-style regime:
    * documents are concatenated in id order per group and sliced into
    * fixed seqLen-token windows, splitting documents at boundaries).
    * Reports, per group: document/token totals, the number of training
    * sequences produced (⌈tokens/seqLen⌉), and how many documents straddle
    * a sequence boundary (get split) — the quantity packing strategies
    * trade against padding waste.
    *
    * Plan: one window cumulative sum per group (a single shuffle on the
    * group key — the minimum, since packing is defined by intra-group
    * order) + one aggregation. All arithmetic is integer (exact on any
    * engine).
    */
  def packingStats(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val toks = TextOps.tokenCount(col(textCol))
    val withCum = df
      .select(col(groupCol), col(idCol), toks.as("__t"))
      .withColumn("__end", sum(col("__t")).over(w))
      .withColumn("__start", col("__end") - col("__t"))
    val straddles = col("__t") > 0 &&
      expr(s"__start div $seqLen") =!= expr(s"(__end - 1) div $seqLen")
    withCum.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        expr(s"(sum(__t) + ${seqLen - 1}) div $seqLen").as("n_sequences"),
        sum(when(straddles, 1L).otherwise(0L)).as("n_docs_split"))
  }

  /** Eval-set decontamination: find training documents sharing at least
    * minShared distinct n-gram shingles with ANY document of the eval set —
    * the standard guard against benchmark leakage into training data.
    *
    * Scale shape: both sides reduce to skinny (docId, shingleHash) pairs;
    * the eval side (tiny by construction) is aggregated to DISTINCT hashes
    * and broadcast by AQE; one join + one groupBy count. Shingle identity
    * is its 64-bit hash, as in [[Dedup.ngramJaccardPairs]] (collisions
    * negligible; distinct counts coincide with string shingles).
    *
    * @return (idCol, n_shared) — one row per CONTAMINATED training doc
    */
  def contaminatedDocs(train: DataFrame, eval: DataFrame, idCol: String,
                       textCol: String, shingleSize: Int = 3,
                       minShared: Long = 1L): DataFrame = {
    import graft.functions.ArrayMath
    def shingles(d: DataFrame) = d
      .select(col(idCol), array_distinct(ArrayMath.shingleHashes(
        TextOps.tokens(TextOps.normalized(col(textCol))), shingleSize)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col(idCol), explode(col("__shs")).as("__sh"))
    val evalShingles = shingles(eval).select(col("__sh")).distinct()
    shingles(train)
      .join(evalShingles, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
