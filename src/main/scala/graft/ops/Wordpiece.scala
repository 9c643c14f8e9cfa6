package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** WordPiece tokenizer (Schuster & Nakajima, ICASSP 2012 — the BERT
  * tokenizer family): the third trainer next to [[Bpe]] (frequency-ranked
  * merges) and [[Unigram]] (EM over a candidate vocab). WordPiece merges
  * like BPE but ranks candidate pairs by the LIKELIHOOD gain
  *
  *   score(l, r) = count(lr) / (count(l) · count(r))
  *
  * — fuse the pair whose joint occurrence is most surprising given its
  * parts — which prefers meaningful affixes over merely-frequent pairs.
  *
  * Determinism contract: the selection rule is defined on the
  * 10^18-scaled FLOORED integer ratio
  *
  *   score_scaled = (count(lr) · 10^18) div (count(l) · count(r))
  *
  * with ties broken by (pair count desc, left, right) — exact decimal /
  * HUGEINT arithmetic both engines replay bit-for-bit (the same
  * quantize-then-tiebreak discipline as the q129 RRF integers). All
  * counts are exact word-histogram-weighted integers.
  *
  * Training is the [[Bpe]] shape: ONE corpus-scale pass to the word-type
  * histogram, then every round runs entirely on the vocab plane — one
  * symbol-count aggregation + one pair aggregation + one TakeOrdered
  * row to the driver per merge. Symbols carry no continuation marker
  * during training (scores are over plain within-word symbols); the
  * `##` surface form is applied by [[encodeWords]], which implements
  * WordPiece's actual inference rule — greedy LONGEST-MATCH against the
  * final vocabulary, not merge replay.
  */
object Wordpiece {

  /** One learned merge: rank order, the joined symbols, the scaled
    * likelihood score and the pair count at merge time.
    */
  case class Merge(rank: Int, left: String, right: String,
                   scoreScaled: Long, pairCount: Long)

  private val Scale = "1000000000000000000" // 10^18

  /** Learn up to `numMerges` merges. Stops early when no pair reaches
    * `minPairCount`. Sequential-exact (one merge per round — the
    * likelihood scores change after every fusion, so WordPiece has no
    * symbol-disjoint batching shortcut like [[Bpe.train]]'s).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 256,
      s"numMerges must be in [1,256], got $numMerges")
    val wordCounts = df
      .select(explode(TextOps.tokens(TextOps.normalized(col(textCol))))
        .as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var vocab = wordCounts
      .select(col("cnt"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var sinceCheckpoint = 0
    var done = false
    while (rank < numMerges && !done) {
      val syms = vocab
        .select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy("s").agg(sum(col("cnt")).as("sc"))
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (a, b) -> struct(a AS l, b AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .join(syms.select(col("s").as("l"), col("sc").as("scl")), Seq("l"))
        .join(syms.select(col("s").as("r"), col("sc").as("scr")), Seq("r"))
        .withColumn("score", expr(
          s"(CAST(pc AS DECIMAL(20,0)) * CAST($Scale AS DECIMAL(19,0)))" +
            " div (CAST(scl AS DECIMAL(20,0)) * CAST(scr AS DECIMAL(20,0)))"))
        .orderBy(col("score").desc, col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("pc") < minPairCount) done = true
      else {
        val (l, r) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"))
        merges += Merge(rank, l, r, top(0).getAs[Long]("score"),
          top(0).getAs[Long]("pc"))
        rank += 1
        sinceCheckpoint += 1
        val next = vocab.withColumn("syms",
          ArrayMath.bpeMergePair(col("syms"), lit(l), lit(r)))
        vocab = if (sinceCheckpoint >= 4) {
          sinceCheckpoint = 0; next.localCheckpoint()
        } else next
      }
    }
    merges.result()
  }

  /** Learned merges as a DataFrame artifact (the [[Bpe.mergesDf]]
    * convention).
    */
  def mergesDf(df: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.scoreScaled, m.pairCount))
      .toDF("rank", "left", "right", "score_scaled", "pair_count")
  }

  /** The inference vocabulary: every single character seen in training
    * plus every merged symbol, longest-match-ready.
    */
  def vocabOf(df: DataFrame, textCol: String,
              merges: Seq[Merge]): Seq[String] = {
    val chars = df
      .select(explode(TextOps.tokens(TextOps.normalized(col(textCol))))
        .as("w"))
      .select(explode(expr("filter(split(w, ''), x -> x != '')")).as("c"))
      .distinct().collect().map(_.getString(0)) // alphabet-bounded
    (chars ++ merges.map(m => m.left + m.right)).distinct.toSeq
  }

  /** WordPiece ENCODE — greedy longest-match against `vocab` (the
    * algorithm BERT ships; merge order is irrelevant at inference):
    * repeatedly take the longest vocabulary piece prefixing the rest of
    * the word; pieces after the first render with the `##` continuation
    * prefix; a word with an unmatchable position (or longer than
    * `maxPieces` pieces) becomes the single token `[UNK]`.
    *
    * Pure codegen'd higher-order expressions: the vocabulary rides the
    * plan as one array literal (alphabet + merges — thousands of
    * entries at production vocab sizes, the
    * [[Similarity.semanticContamination]] plan-reference convention)
    * and each word pays O(maxPieces · |vocab|) comparisons with ZERO
    * shuffle. Input is a word-level frame (one row per word — encode a
    * corpus via its word histogram and join back, the [[Unigram]]
    * lane's shape).
    *
    * → input columns + `outCol` array<string> of rendered pieces.
    */
  def encodeWords(df: DataFrame, wordCol: String, outCol: String,
                  vocab: Seq[String], maxPieces: Int = 32): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(maxPieces >= 1 && maxPieces <= 64,
      s"maxPieces must be in [1,64], got $maxPieces")
    val vl = typedLit(vocab)
    val w = col(wordCol)
    def step(acc: Column): Column = {
      val pos = acc.getField("pos")
      val toks = acc.getField("toks")
      val matches = filter(vl, p =>
        call_function("substring", w, pos, length(p)) === p)
      val best = aggregate(matches, lit(""),
        (b, p) => when(length(p) > length(b), p).otherwise(b))
      when(acc.getField("bad") || pos > length(w), acc)
        .otherwise(when(best === "",
          struct((length(w) + 1).as("pos"), toks.as("toks"),
            lit(true).as("bad")))
          .otherwise(struct((pos + length(best)).as("pos"),
            concat(toks, array(when(pos === 1, best)
              .otherwise(concat(lit("##"), best)))).as("toks"),
            lit(false).as("bad"))))
    }
    val init = struct(lit(1).as("pos"),
      array().cast("array<string>").as("toks"), lit(false).as("bad"))
    val fin = aggregate(sequence(lit(1), lit(maxPieces)), init,
      (acc, _) => step(acc))
    df.withColumn(outCol,
      when(w.isNull, lit(null).cast("array<string>"))
        .otherwise(when(fin.getField("bad") ||
          fin.getField("pos") <= length(w), array(lit("[UNK]")))
          .otherwise(fin.getField("toks"))))
  }
}
