package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier gate of GPT-3
  * (Brown et al. 2020, Appendix A: "documents similar to a curated
  * reference corpus") and DCLM/fineweb-edu-style pipelines: label a
  * reference slice positive, the rest negative, train a linear model
  * over hashed bag-of-ngram features, keep documents the model scores
  * as reference-like.
  *
  * Two tiers:
  *   - [[nbScores]] (the oracle-grade default): Naive-Bayes
  *     log-count-ratio weights (Wang & Manning, ACL 2012 — the "NBSVM"
  *     feature trick, also the heart of fastText-style linear quality
  *     classifiers). Training IS counting: one aggregation per class
  *     over the hashed-ngram frame, weights closed-form from exact
  *     integer counts, every per-occurrence term ONE ln of
  *     integer-derived ratios (the q106/q109/q113 cross-engine parity
  *     recipe) routed through DECIMAL(18,12) — a SQL oracle replays
  *     training AND scoring bit-for-bit.
  *   - [[trainLogistic]]: full-batch gradient-descent refinement
  *     starting from zero (the NB weights make a stronger init — pass
  *     them via `init`). Each iteration is two skinny shuffles over the
  *     persisted feature frame plus one bounded (≤ nBuckets+1 doubles)
  *     driver collect; spec-certified (loss monotone, planted
  *     separation, layout invariance) rather than oracle-replayed —
  *     iterative float training is not SQL-expressible.
  *
  * Scale shape: features are [[Curation.hashedNgrams]] buckets (md5 by
  * default so oracles replay them; `scaleHash = true` switches to the
  * cheaper codegen xxhash64 — pass the SAME flavor to every tier that
  * shares weights) — the corpus tokenizes ONCE into a skinny
  * (doc, bucket) frame; class count tables are ≤ nBuckets rows
  * (broadcast by construction); the text column never shuffles.
  */
object Classifier {

  /** Per-document reference-likeness log-odds under NB log-count-ratio
    * weights with add-one smoothing:
    *
    *   score(d) = ln(Npos/Nneg)
    *            + Σ_occurrences [ ln((pc_b + 1)/(ptot + B))
    *                            − ln((nc_b + 1)/(ntot + B)) ]
    *
    * where pc/nc are per-bucket occurrence counts in the positive /
    * negative class, ptot/ntot their totals, B = nBuckets. Returns
    * (idCol, n_features, score, keep) for EVERY input row: featureless
    * documents score NULL and are never kept, `keep = score > 0` (the
    * decision boundary of the log-odds form).
    *
    * Cache lifetime: with `cacheFeatures = true` (the default) the
    * hashed-ngram occurrence frame is persisted and — because the
    * returned value is a lazy plan over it — stays in the cache until
    * session end. Scoring many distinct corpora in one long-lived
    * session accumulates one entry each; either pass
    * `cacheFeatures = false` or call `spark.catalog.clearCache()`
    * between corpora (the [[Curation.dsirWeights]] contract).
    *
    * @param isPos boolean label column (evaluated against `docs`):
    *              the curated reference slice
    */
  /** The hashed occurrence frame and its per-bucket class counts — ONE
    * definition shared by [[nbScores]] (scoring) and [[nbWeights]] (the
    * materialized init vector), so the two NB formulations cannot drift:
    * any change to smoothing inputs, labeling, or the hash flavor
    * contract flows through both.
    */
  private def classCounts(labeled: DataFrame, idCol: String, textCol: String,
                          nBuckets: Int,
                          scaleHash: Boolean): (DataFrame, DataFrame) = {
    val feats = Curation.hashedNgrams(
      labeled, Seq(col(idCol), col("__y")), textCol, nBuckets, scaleHash)
    val counts = feats.groupBy(col("__b"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__pc"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__nc"))
    (feats, counts)
  }

  def nbScores(docs: DataFrame, idCol: String, textCol: String,
               isPos: Column, nBuckets: Int = 10000,
               scaleHash: Boolean = false,
               cacheFeatures: Boolean = true): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val labeled = docs.withColumn("__y", isPos)
    // cache: the occurrence frame feeds both the class-count
    // aggregation (training) and the scoring join — one tokenize+hash
    // pass instead of two. Same lifetime contract as
    // [[Curation.dsirWeights]]: the entry lives until session end;
    // long-lived multi-corpus services pass `cacheFeatures = false`.
    val (feats0, counts) = classCounts(labeled, idCol, textCol, nBuckets, scaleHash)
    val feats = if (cacheFeatures) feats0.persist() else feats0
    // totals + document-count prior: one broadcast row
    val totals = counts.agg(sum(col("__pc")).as("__ptot"),
        sum(col("__nc")).as("__ntot"))
      .crossJoin(labeled.agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__npos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__nneg")))
    val term = (log(col("__pc") + 1L) - log(col("__ptot") + lit(nBuckets).cast("long"))
      - log(col("__nc") + 1L) + log(col("__ntot") + lit(nBuckets).cast("long")))
      .cast("decimal(18,12)")
    val scored = feats
      .join(broadcast(counts), Seq("__b"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        (sum(term).cast("double")
          + max(log(col("__npos").cast("double") / col("__nneg"))))
          .as("__s"))
      .select(col(idCol), col("n_features"), round(col("__s"), 6).as("score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"), col("score"),
        coalesce(col("score") > 0.0, lit(false)).as("keep"))
  }

  /** NB log-count-ratio weight VECTOR (length nBuckets + 1, bias last:
    * the ln(Npos/Nneg) prior) — the same closed-form weights
    * [[nbScores]] applies, materialized as the NBSVM-style init for
    * [[trainLogistic]] (Wang & Manning ACL 2012: NB features, then a
    * discriminative pass). Buckets unseen in training get the add-one
    * smoothing default ln((ntot+B)/(ptot+B)), not zero — that IS their
    * NB weight. Driver traffic: the ≤ nBuckets-row count table plus one
    * prior row (same bound as one [[trainLogistic]] iteration).
    *
    * `scaleHash` must match the flavor of every tier sharing these
    * weights — md5 and xxhash64 bucket the same grams differently.
    */
  def nbWeights(docs: DataFrame, idCol: String, textCol: String,
                isPos: Column, nBuckets: Int = 10000,
                scaleHash: Boolean = false): Array[Double] = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val labeled = docs.withColumn("__y", isPos)
    val counts = classCounts(labeled, idCol, textCol, nBuckets, scaleHash)
      ._2.collect() // bounded: <= nBuckets rows
    val ptot = counts.map(_.getLong(1)).sum
    val ntot = counts.map(_.getLong(2)).sum
    val prior = labeled.agg(
      sum(when(col("__y"), 1L).otherwise(0L)),
      sum(when(col("__y"), 0L).otherwise(1L))).head() // 1 row
    // a usable weight vector needs both classes populated: an empty
    // corpus NULLs the sums, a one-class corpus makes the prior ±∞ and
    // poisons every gradient step seeded from it — fail loudly instead
    val npos = if (prior.isNullAt(0)) 0L else prior.getLong(0)
    val nneg = if (prior.isNullAt(1)) 0L else prior.getLong(1)
    require(npos > 0 && nneg > 0,
      s"nbWeights needs documents in BOTH classes: npos=$npos nneg=$nneg")
    val b = nBuckets.toLong
    val w = Array.fill(nBuckets + 1)(
      math.log(1.0 / (ptot + b)) - math.log(1.0 / (ntot + b)))
    counts.foreach { r =>
      w(r.getLong(0).toInt) =
        math.log((r.getLong(1) + 1.0) / (ptot + b)) -
          math.log((r.getLong(2) + 1.0) / (ntot + b))
    }
    w(nBuckets) = math.log(npos.toDouble / nneg)
    w
  }

  /** Full-batch logistic regression over L1-normalized hashed-ngram
    * counts (x_b = count_b / n_features): `iters` gradient steps at
    * rate `lr`, weights indexed [0, nBuckets) plus bias at [nBuckets].
    * Returns (weights, per-iteration mean log-loss, per-iteration
    * gradient rows collected) — the loss trace is the training-health
    * artifact the spec asserts on, and the gradient-row trace makes the
    * driver-traffic bound OBSERVABLE: each entry is the exact number of
    * (bucket, gradient) rows that crossed to the driver that iteration,
    * ≤ nBuckets by construction (plus one bias scalar and one loss
    * scalar — the ≤ nBuckets+1-doubles-per-iteration contract the scale
    * spec pins). Per-document dots and per-bucket gradients route
    * through DECIMAL so training is deterministic under any
    * partitioning.
    */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
                    isPos: Column, nBuckets: Int = 10000, iters: Int = 5,
                    lr: Double = 1.0,
                    init: Array[Double] = null,
                    scaleHash: Boolean = false): (Array[Double], Seq[Double], Seq[Int]) = {
    require(iters >= 1, "iters must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val labeled = docs.withColumn("__y", isPos.cast("double"))
    // tokenize ONCE; x = per-doc L1-normalized bucket count. scaleHash
    // must MATCH the flavor any `init` weights were trained under —
    // xxhash64 and md5 bucket the same grams differently, so mixed
    // flavors would silently index two different feature spaces
    val feats = Curation.hashedNgrams(
        labeled, Seq(col(idCol), col("__y")), textCol, nBuckets, scaleHash)
      .groupBy(col(idCol), col("__y"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      .select(col(idCol), col("__y"), col("__b"), (col("__c") / col("__n")).as("__x"))
      .persist()
    try {
      val n = feats.select(col(idCol)).distinct().count().toDouble
      val w = if (init != null) init.clone() else new Array[Double](nBuckets + 1)
      require(w.length == nBuckets + 1, "init must be nBuckets + 1 long (bias last)")
      val losses = Seq.newBuilder[Double]
      val gradRows = Seq.newBuilder[Int]
      for (_ <- 1 to iters) {
        val wDf = w.take(nBuckets).zipWithIndex
          .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("__b", "__w")
        val bias = w(nBuckets)
        // p per doc from the CURRENT weights; decimal-routed dot so the
        // sigmoid input is partition-order independent
        val p = feats.join(broadcast(wDf), Seq("__b"))
          .groupBy(col(idCol), col("__y"))
          .agg(sum((col("__x") * col("__w")).cast("decimal(28,18)"))
            .cast("double").as("__dot"))
          .select(col(idCol), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("__dot") + lit(bias))))).as("__p"))
        // gradient of mean log-loss; one bounded collect (<= nBuckets rows)
        val joined = feats.join(p.select(col(idCol), col("__p")), Seq(idCol))
        val grad = joined
          .groupBy(col("__b"))
          .agg(sum(((col("__p") - col("__y")) * col("__x")).cast("decimal(28,18)"))
            .cast("double").as("__g"))
          .collect().map(r => (r.getLong(0).toInt, r.getDouble(1))).toMap
        gradRows += grad.size
        val gBias = p.agg(sum((col("__p") - col("__y")).cast("decimal(28,18)"))
          .cast("double")).head().getDouble(0)
        val loss = p.agg(sum(
            (-(col("__y") * log(greatest(col("__p"), lit(1e-15)))
              + (lit(1.0) - col("__y"))
                * log(greatest(lit(1.0) - col("__p"), lit(1e-15)))))
            .cast("decimal(28,18)")).cast("double")).head().getDouble(0) / n
        losses += loss
        var b = 0
        while (b < nBuckets) {
          w(b) -= lr * grad.getOrElse(b, 0.0) / n
          b += 1
        }
        w(nBuckets) -= lr * gBias / n
      }
      (w, losses.result(), gradRows.result())
    } finally { feats.unpersist(false); () }
  }

  /** EXACT ROC AUC via the Mann–Whitney rank statistic with midrank tie
    * correction (Hanley & McNeil 1982) — the threshold-free ranking
    * quality of a score, and the honest flavor: trapezoid-over-
    * thresholds implementations silently mis-handle ties that heuristic
    * scores (ratios of small integers) produce constantly. Doubling the
    * midranks keeps EVERYTHING integer:
    *
    *   R2  = Σ_v pos_v · (2·cntBefore_v + n_v + 1)   (= 2·Σ midranks)
    *   AUC = (R2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    *
    * — one IEEE division at the end, so the value hash-matches.
    *
    * Scale shape: the corpus compresses to the DISTINCT-SCORE plane in
    * one aggregation (heuristic scores have few distinct values; that
    * plane, not the corpus, feeds the rank cumsum). NULL scores/labels
    * are excluded.
    *
    * → one row (n_pos, n_neg, auc); auc NULL when either class is
    *   empty.
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val g = df
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    // distinct-score plane (documented bounded): single-partition cumsum
    val wBefore = W.partitionBy(graft.functions.ArrayMath.boundedKey(g))
      .orderBy(col("__s"))
      .rowsBetween(W.unboundedPreceding, -1)
    val t = g
      .withColumn("__before", coalesce(sum(col("__n")).over(wBefore), lit(0L)))
      .agg(
        coalesce(sum(col("__pos").cast("decimal(38,0)") *
          (lit(2L) * col("__before") + col("__n") + lit(1L))), lit(0)
          .cast("decimal(38,0)")).as("__r2"),
        coalesce(sum(col("__pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__n") - col("__pos")), lit(0L)).as("n_neg"))
    t.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        (col("__r2").cast("string").cast("double") -
          col("n_pos").cast("double") *
            (col("n_pos").cast("double") + lit(1.0))) /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  /** Average precision (the PR-AUC summary) with atomic tie blocks —
    * the sklearn step formula AP = Σ_k (R_k − R_{k−1})·P_k evaluated
    * per DISTINCT score descending, each tied block contributing its
    * end-of-block precision (splitting a tie arbitrarily would make
    * the value order-dependent):
    *
    *   AP = Σ_blocks pos_k · (cumPos_k / cumN_k) / n_pos
    *
    * cum counts are exact integers off one descending cumsum on the
    * distinct-score plane; each block term is an engine-identical
    * double cast to DECIMAL(28,12) before the order-independent sum
    * (28: the term is bounded by pos_k, and a heuristic score's tie
    * block can hold millions of positives — 18,12 would overflow to
    * NULL and silently drop the block).
    * The PR companion of [[rocAuc]] — preferred when positives are
    * rare (AUC saturates, AP does not).
    *
    * → one row (n_pos, n_neg, average_precision); NULL when no
    *   positives.
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val g = df
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    // distinct-score plane (documented bounded): single-partition cumsum
    val wDesc = W.partitionBy(graft.functions.ArrayMath.boundedKey(g))
      .orderBy(col("__s").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    g.withColumn("__cumN", sum(col("__n")).over(wDesc))
      .withColumn("__cumPos", sum(col("__pos")).over(wDesc))
      .withColumn("__term",
        (col("__pos").cast("double") *
          (col("__cumPos").cast("double") / col("__cumN").cast("double")))
          .cast("decimal(28,12)"))
      .agg(coalesce(sum(col("__pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__n") - col("__pos")), lit(0L)).as("n_neg"),
        sum(col("__term")).as("__ap_num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          col("__ap_num").cast("string").cast("double") /
            col("n_pos").cast("double")).as("average_precision"))
  }

  /** Per-class precision / recall / F1 + accuracy — the standard
    * classification report (the eval table every model card prints):
    * everything reduces through the confusion plane (one corpus
    * aggregation, ≤K² rows), classes = union of predicted and actual
    * (a class never predicted still reports recall, a hallucinated one
    * still reports precision). F1 is computed as 2·tp/(n_pred +
    * n_actual) — algebraically the harmonic mean, but ONE division, so
    * no intermediate-rounding divergence between engines. Rows with a
    * NULL prediction or label are excluded.
    *
    * → (category, n_pred, n_actual, tp, precision, recall, f1,
    *   accuracy) — accuracy repeated on every row; per-class ratios
    *   NULL when their denominator is 0.
    */
  def classificationReport(df: DataFrame, predCol: String,
                           labelCol: String): DataFrame = {
    val conf = df
      .select(col(predCol).cast("string").as("__p"),
        col(labelCol).cast("string").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .groupBy("__p", "__y").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared skinny plane: scan the corpus ONCE
    val classes = conf.select(col("__p").as("category"))
      .union(conf.select(col("__y").as("category"))).distinct()
    val predN = conf.groupBy(col("__p").as("category"))
      .agg(sum("__n").as("n_pred"))
    val actN = conf.groupBy(col("__y").as("category"))
      .agg(sum("__n").as("n_actual"))
    val tp = conf.filter(col("__p") === col("__y"))
      .select(col("__p").as("category"), col("__n").as("tp"))
    val tot = conf.agg(sum("__n").as("__N0"),
      coalesce(sum(when(col("__p") === col("__y"), col("__n"))), lit(0L))
        .as("__tpall"))
    classes
      .join(predN, Seq("category"), "left")
      .join(actN, Seq("category"), "left")
      .join(tp, Seq("category"), "left")
      .crossJoin(broadcast(tot))
      .select(col("category"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        col("__N0"), col("__tpall"))
      .select(col("category"), col("n_pred"), col("n_actual"), col("tp"),
        when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        when(col("n_actual") > 0,
          col("tp").cast("double") / col("n_actual").cast("double"))
          .as("recall"),
        when(col("n_pred") + col("n_actual") > 0,
          lit(2.0) * col("tp").cast("double") /
            (col("n_pred") + col("n_actual")).cast("double")).as("f1"),
        (col("__tpall").cast("double") / col("__N0").cast("double"))
          .as("accuracy"))
  }

  /** Reliability diagram + expected calibration error (Naeini et al.
    * AAAI 2015; Guo et al. ICML 2017 popularized ECE for neural
    * classifiers): equal-width score bins, per-bin mean confidence vs
    * empirical accuracy, ECE = Σ_b (n_b/N)·|acc_b − conf_b| — the
    * standard audit before classifier scores gate a corpus (an
    * uncalibrated quality score silently shifts the keep threshold).
    *
    * Exactness discipline: per-bin score sums ride DECIMAL(18,6) (order-
    * independent), and the ECE numerator is computed as
    * Σ_b |pos_b − s_sum_b| — algebraically (n_b/N)·|acc−conf| =
    * |pos − s_sum|/N per bin — so the WHOLE report including ECE stays
    * in exact decimal/integer arithmetic until a fixed sequence of IEEE
    * divisions at the end; any engine replays it bit-for-bit.
    *
    * One aggregation over the corpus (≤ nBins partial rows per
    * partition after map-side combine), one tiny second pass for the
    * total; rows with NULL score or label are excluded.
    *
    * @param scoreCol a probability-like score in [0,1]
    * @param labelCol 0/1 (castable) outcome
    * @return (bin, n, pos, conf, acc, gap, ece) — one row per
    *         NON-EMPTY bin, ece repeated on every row
    */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000,
      s"nBins must be in [2,1000], got $nBins")
    val binned = df
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("long").as("__y"))
      // enforce the documented [0,1] score precondition: an out-of-range
      // score would otherwise land in a negative (or top-clamped) bin and
      // silently corrupt the per-bin report and the ECE
      .filter(col("__s").isNotNull && col("__y").isNotNull &&
        col("__s") >= 0.0 && col("__s") <= 1.0)
      .select(least(floor(col("__s") * nBins), lit(nBins - 1L)).as("bin"),
        col("__y"), col("__s").cast("decimal(18,6)").as("__sd"))
    val perBin = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("__sd")).as("__s_sum"))
      .localCheckpoint() // shared by the report and the ECE total
    val tot = perBin.agg(sum(col("n")).as("__N"),
      sum(abs(col("pos") - col("__s_sum"))).as("__gap_total"))
    perBin.crossJoin(tot)
      .select(col("bin"), col("n"), col("pos"),
        (col("__s_sum").cast("string").cast("double") /
          col("n").cast("double")).as("conf"),
        (col("pos").cast("double") / col("n").cast("double")).as("acc"),
        (abs(col("pos") - col("__s_sum")).cast("string").cast("double") /
          col("n").cast("double")).as("gap"),
        (col("__gap_total").cast("string").cast("double") /
          col("__N").cast("double")).as("ece"))
  }

  /** Isotonic (monotone) calibration via pool-adjacent-violators
    * (Ayer et al. 1955; Zadrozny & Elkan, KDD'02 brought it to
    * classifier calibration) — the nonparametric repair for the
    * miscalibration [[calibrationReport]] diagnoses: bin the scores
    * (the calibrationReport binning, [0,1] enforced), then fit the
    * unique nondecreasing step function minimizing squared error to
    * the per-bin positive rates. Platt scaling assumes a sigmoid
    * shape; PAV assumes only monotonicity.
    *
    * Determinism: binning and per-bin (n, pos) are exact integers; the
    * PAV pooling decision compares block means by CROSS-MULTIPLIED
    * BigInt products (no FP in any pooling decision), and each fitted
    * value is ONE IEEE division pos_block/n_block of exact longs. The
    * same fit has the min-max closed form ĝ(i) = max_{a≤i} min_{b≥i}
    * mean[a,b] (Robertson–Wright–Dykstra 1988 §1.2), whose attained
    * value is the SAME two integers divided once — so an engine
    * replaying the closed form hash-matches this PAV bit-for-bit, an
    * algorithm-independent cross-check.
    *
    * Scale shape: one aggregation to the ≤nBins plane; PAV runs on the
    * driver over that bounded plane (documented bounded driver
    * traffic — nBins ≤ 1000 rows, the [[graft.ops.Pca]] eigensolve
    * convention). Empty bins get no row; pooling is over PRESENT bins.
    *
    * → (bin, n, pos, calibrated), ascending by bin
    */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
                          labelCol: String, nBins: Int = 20): DataFrame = {
    require(nBins >= 2 && nBins <= 1000,
      s"nBins must be in [2,1000], got $nBins")
    val perBin = df
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull &&
        col("__s") >= 0.0 && col("__s") <= 1.0)
      .select(least(floor(col("__s") * nBins), lit(nBins - 1L)).as("bin"),
        col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      .orderBy("bin")
      .collect() // bounded: ≤ nBins rows
    // PAV: stack of blocks; merge while the previous block's mean
    // exceeds the new one's (strict — equal means pool to equal fits
    // either way). Means compared as exact cross products.
    final case class Blk(n: Long, pos: Long, bins: List[Long])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Blk]
    perBin.foreach { r =>
      var cur = Blk(r.getLong(1), r.getLong(2), List(r.getLong(0)))
      while (stack.nonEmpty &&
        BigInt(stack.last.pos) * cur.n > BigInt(cur.pos) * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Blk(prev.n + cur.n, prev.pos + cur.pos, prev.bins ++ cur.bins)
      }
      stack += cur
    }
    val rows = stack.toSeq.flatMap { b =>
      val cal = b.pos.toDouble / b.n.toDouble
      // recover each bin's own (n, pos) for the output
      b.bins.map { bin =>
        val r = perBin.find(_.getLong(0) == bin).get
        (bin, r.getLong(1), r.getLong(2), cal)
      }
    }.sortBy(_._1)
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("bin", "n", "pos", "calibrated")
  }

  /** Split-conformal prediction thresholds (Vovk et al. 2005;
    * Angelopoulos & Bates 2021 §1 — the distribution-free selective-
    * prediction calibration a classifier gate runs before acting on
    * its scores): per group (Mondrian conformal — e.g. per language or
    * per label) the threshold is the k-th smallest calibration
    * nonconformity score with
    *
    *   k = ⌈(n+1)·(1−α)⌉
    *
    * which guarantees ≥ 1−α coverage on exchangeable test points. α
    * arrives as the exact rational alphaNum/alphaDen so k is pure
    * integer arithmetic: k = ((n+1)·(alphaDen−alphaNum) + alphaDen−1)
    * div alphaDen; the threshold itself is an order statistic — a
    * VALUE from the data, never an interpolation — so the whole
    * operator replays exactly in any engine. k > n (too little
    * calibration data for the requested α) reports a NULL threshold
    * with finite_threshold = false: the honest "predict everything"
    * verdict, never a silent clamp.
    *
    * Scale shape: one per-group window pass (the
    * [[graft.ops.Curation.stratifiedSample]] shape — per-group rank +
    * count, shuffle keyed on the group); one row out per group.
    *
    * → (groupCol, n_cal, k, qhat, finite_threshold, coverage_level =
    *   k/(n+1), the exact guaranteed level)
    */
  def conformalThresholds(cal: DataFrame, groupCol: String,
                          scoreCol: String, alphaNum: Int,
                          alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
    val wAll = Window.partitionBy(col(groupCol))
    cal.filter(col(scoreCol).isNotNull)
      .select(col(groupCol), col(scoreCol).cast("double").as("__s"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__k", expr( // integral div: `/` on longs is double
        s"CAST(((__n + 1) * ${alphaDen - alphaNum} + ${alphaDen - 1})" +
          s" DIV $alphaDen AS BIGINT)"))
      .filter(col("__rn") === least(col("__k"), col("__n")))
      .select(col(groupCol), col("__n").as("n_cal"), col("__k").as("k"),
        when(col("__k") <= col("__n"), col("__s")).as("qhat"),
        (col("__k") <= col("__n")).as("finite_threshold"),
        (col("__k").cast("double") / (col("__n") + 1L).cast("double"))
          .as("coverage_level"))
  }

  /** Empirical coverage of [[conformalThresholds]] on a held-out test
    * frame: per group, the fraction of test scores ≤ qhat (an infinite
    * threshold covers everything). The validation read the conformal
    * guarantee is checked with.
    *
    * → (groupCol, n_test, n_covered, coverage)
    */
  def conformalCoverage(test: DataFrame, groupCol: String,
                        scoreCol: String, thresholds: DataFrame): DataFrame = {
    test.filter(col(scoreCol).isNotNull)
      .select(col(groupCol), col(scoreCol).cast("double").as("__s"))
      .join(broadcast(thresholds.select(col(groupCol), col("qhat"),
        col("finite_threshold"))), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_test"),
        sum(when(!col("finite_threshold") || col("__s") <= col("qhat"),
          1L).otherwise(0L)).as("n_covered"))
      .select(col(groupCol), col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }
}
