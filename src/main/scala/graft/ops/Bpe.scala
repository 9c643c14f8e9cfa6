package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** Byte-pair-encoding tokenizer: distributed vocabulary TRAINING and
  * corpus-scale ENCODING (Sennrich et al., ACL'16 — the subword algorithm
  * behind GPT/Llama-family tokenizers; whitespace pre-tokenization, merges
  * learned over word TYPES).
  *
  * Scale shape:
  *   - ONE corpus-scale pass total: the word-type histogram (one explode +
  *     one shuffle). Everything iterative happens on the VOCAB table —
  *     |word types| rows (≲ millions), independent of corpus size — so
  *     `numMerges` iterations cost numMerges aggregations of a small
  *     cached frame, not numMerges corpus scans. Lineage is flattened
  *     with localCheckpoint per merge (same discipline as
  *     [[Dedup.connectedComponents]]'s iterate loop).
  *   - each iteration moves ONE row to the driver (the winning pair).
  *   - encoding is a pure projection: one codegen-span call per row into
  *     [[graft.functions.BpeEncode]], the learned merge ranks riding the
  *     plan as a single reference object (bloom-filter pattern). Greedy
  *     lowest-rank-first application, the standard BPE encode.
  *
  * Determinism: the winning pair maximizes summed count with ties broken
  * lexicographically on (left, right) — training is reproducible across
  * partitionings (spec-asserted), so merges learned once can be shipped
  * as config.
  */
object Bpe {

  /** One learned merge: rank order, the two symbols joined, and the
    * pair's weighted count at merge time.
    */
  case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Learn up to `numMerges` merges from the corpus. Stops early when no
    * pair reaches `minPairCount`. Word types are split to single
    * characters and greedily fused; a space is reserved as an internal
    * separator and must not occur in the text.
    *
    * `batchSize` — merges accepted per aggregation round:
    *   - 1 (default): EXACT sequential BPE (Sennrich ACL'16) — one
    *     aggregation + one driver round-trip per merge. Right for
    *     fixture-scale vocabularies and for oracle replay, but a real
    *     32k-merge tokenizer would cost 32k Spark jobs of scheduler
    *     overhead.
    *   - B > 1: the SentencePiece/HF-style batched approximation — each
    *     round takes the top-B pairs (count desc, ties lexicographic)
    *     that are pairwise SYMBOL-DISJOINT, so a 32k-merge vocabulary
    *     costs ~32k/B aggregation rounds. Disjointness makes the batch
    *     exact-at-acceptance: applying one accepted pair cannot change
    *     another accepted pair's count (only pairs sharing a symbol
    *     gain/lose occurrences), so every recorded pairCount is the true
    *     count at application time and training stays fully deterministic
    *     under any partitioning. The approximation vs sequential: a pair
    *     NEWLY CREATED mid-batch (count <= its creator's) cannot be
    *     picked until the next round — the standard production trade.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, batchSize: Int = 1): Seq[Merge] =
    trainWithStats(df, textCol, numMerges, minPairCount, batchSize)._1

  /** [[train]] plus the aggregation-round count (for scale tests: rounds
    * must shrink as ~numMerges/batchSize, the whole point of batching).
    */
  private[graft] def trainWithStats(df: DataFrame, textCol: String,
                                    numMerges: Int, minPairCount: Long = 2L,
                                    batchSize: Int = 1): (Seq[Merge], Int) = {
    require(numMerges >= 1, "numMerges must be positive")
    require(batchSize >= 1, "batchSize must be positive")
    // the single corpus-scale pass: word-type histogram
    val wordCounts = df
      .select(explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // vocab-plane from here on: syms = the word as an array of symbols
    var vocab = wordCounts
      .select(col("cnt"), expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var rounds = 0
    var sinceCheckpoint = 0
    var done = false
    while (rank < numMerges && !done) {
      rounds += 1
      val want = math.min(batchSize, numMerges - rank)
      // adjacent pairs weighted by word count; slice twice instead of a
      // positional join — stays one small aggregation (TakeOrdered, one
      // job), no shuffle of anything corpus-sized. The 8x candidate
      // headroom keeps one round productive even when the top of the
      // count table is clustered around a few hot symbols.
      val cand = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (a, b) -> struct(a AS l, b AS r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(8 * want).collect()
      val used = scala.collection.mutable.HashSet.empty[String]
      val picked = Seq.newBuilder[(String, String, Long)]
      var nPicked = 0
      var i = 0
      while (i < cand.length && nPicked < want &&
             cand(i).getLong(2) >= minPairCount) {
        val (l, r) = (cand(i).getString(0), cand(i).getString(1))
        if (!used(l) && !used(r)) {
          picked += ((l, r, cand(i).getLong(2)))
          used += l; used += r
          nPicked += 1
        }
        i += 1
      }
      val batch = picked.result()
      if (batch.isEmpty) done = true
      else {
        // apply in rank order (greedy left-to-right per pair — exactly the
        // encode rewrite); disjointness makes the order immaterial for
        // counts, but keep it for byte-identical vocab evolution
        var next = vocab
        batch.foreach { case (l, r, pc) =>
          merges += Merge(rank, l, r, pc)
          rank += 1
          next = next.withColumn("syms",
            ArrayMath.bpeMergePair(col("syms"), lit(l), lit(r)))
        }
        sinceCheckpoint += batch.length
        // flatten lineage every few applied merges: re-running a few
        // stacked merge projections inside the next aggregation is
        // nearly free. The checkpoint is LAZY — its materialization
        // folds into the next round's candidate aggregation (the first
        // full-scan consumer) instead of paying a standalone job, so a
        // sequential run costs exactly one driver round-trip per merge
        vocab = if (sinceCheckpoint >= 4) {
          sinceCheckpoint = 0; next.localCheckpoint(false)
        } else next
      }
    }
    (merges.result(), rounds)
  }

  /** Learned merges as a DataFrame (rank, left, right, pair_count) — the
    * persistable artifact form of [[train]].
    */
  def mergesDf(df: DataFrame, merges: Seq[Merge]): DataFrame = {
    import df.sparkSession.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Persist learned merges as a parquet artifact (the tokenizer's
    * model file — train once, ship everywhere, like `Ivf.saveIndex`).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
                 path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  /** Load a [[saveMerges]] artifact back into rank order. The collect is
    * bounded by `numMerges` rows (a tokenizer model, not data).
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank").collect().toSeq
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))

  /** Encode: appends `outCol` = array<string> of BPE tokens for the whole
    * document (words whitespace-split and normalized exactly as in
    * [[train]], each encoded by greedy lowest-rank merging). Pure
    * projection, zero shuffles, merge table as one plan reference object.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
             outCol: String = "bpe_tokens"): DataFrame =
    df.withColumn(outCol, ArrayMath.bpeEncode(
      TextOps.tokens(TextOps.normalized(col(textCol))),
      merges.map(m => m.left + " " + m.right).toArray))
}
