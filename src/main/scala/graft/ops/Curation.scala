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

  /** Corpus SNAPSHOT DIFF — the incremental-ingest bookkeeping step
    * every continuously-refreshed corpus runs between versions (what
    * changed since the last training set was cut?): classify every
    * document as `added` (id only in `cur`), `removed` (id only in
    * `prev`), or `changed` (both sides, content fingerprint moved);
    * unchanged documents produce no row, so the result is sized by the
    * CHURN, not the corpus. Content identity is `md5(text)` — computed
    * as a projection on each side so only (id, 32-char fp) rows reach
    * the full-outer join; the document text itself never shuffles.
    * NULL-text documents compare null-safely (two nulls are equal, a
    * null vs text is a change).
    *
    * → (idCol, change, prev_fp, cur_fp).
    */
  def corpusDiff(prev: DataFrame, cur: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val a = prev.select(col(idCol), md5(col(textCol)).as("prev_fp"),
      lit(true).as("__in_prev"))
    val b = cur.select(col(idCol), md5(col(textCol)).as("cur_fp"),
      lit(true).as("__in_cur"))
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_cur").isNull, lit("removed"))
          .when(!(col("prev_fp") <=> col("cur_fp")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(col(idCol), col("change"), col("prev_fp"), col("cur_fp"))
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

  /** Corpus-level boilerplate removal: drop every text unit (token, line —
    * whatever `delim` splits on) that occurs in more than `maxDocFrac` of
    * all documents, preserving the order and multiplicity of everything
    * kept. The cross-document generalization of per-doc cleaning: headers,
    * nav bars, license banners, and template filler are exactly the units
    * whose *document* frequency is pathological.
    *
    * Scale shape: df-counting explodes DISTINCT units per doc (no
    * count-distinct shuffle — distinctness is per-row array work) and
    * aggregates once on the unit key. The frequent set is then collapsed to
    * ONE array row and broadcast: its size is bounded by
    * (avg distinct units per doc) / maxDocFrac — independent of corpus row
    * count, since Σ df ≤ docs × avg-units and each frequent unit costs
    * ≥ maxDocFrac·N of that budget. The rewrite itself is a per-row `filter`
    * HOF against the broadcast array: no join fan-out, no second shuffle.
    */
  def pruneFrequentUnits(df: DataFrame, idCol: String, textCol: String,
                         delim: String = " ",
                         maxDocFrac: Double = 0.5): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1, "maxDocFrac in (0,1]")
    val units = split(col(textCol), java.util.regex.Pattern.quote(delim))
    val total = df.agg(count(lit(1)).as("__n")) // joins as a broadcast row —
    val frequent = df                           // no driver action in the plan
      .select(explode(array_distinct(units)).as("__u"))
      .groupBy(col("__u")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(total))
      .filter(col("__df") > lit(maxDocFrac) * col("__n"))
      .agg(sort_array(collect_list(col("__u"))).as("__freq"))
    df.crossJoin(broadcast(frequent))
      .select(col(idCol),
        array_join(filter(units, u => !array_contains(col("__freq"), u)), delim)
          .as("text_clean"))
  }

  /** Deterministic mixture sampling: downsample each domain so the kept
    * corpus approaches `budgetFrac` of the total with domain shares
    * proportional to `weights` — the "data mixing" step that rebalances
    * web/books/code/… before training. Domains absent from `weights` are
    * dropped. A domain short of its target keeps everything (fraction
    * clamps at 1; no oversampling).
    *
    * Per-domain keep fraction: f_d = min(1, w_d·budgetFrac·N / n_d) with
    * w_d normalized. Row selection is [[hashBucket]] < ⌊f_d·nBuckets⌋ —
    * reproducible across runs/engines/partitionings, and incremental like
    * every hash-gated selection here.
    *
    * Plan: one tiny groupBy for domain counts (|domains| rows) broadcast
    * back onto the corpus; the filter is then a pure projection. Floor (not
    * round) keeps the threshold engine-agnostic at .5 boundaries.
    */
  def sampleToMixture(df: DataFrame, idCol: String, domainCol: String,
                      weights: Seq[(String, Double)], budgetFrac: Double,
                      nBuckets: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac in (0,1]")
    val wTotal = weights.map(_._2).sum
    val wCol = weights.tail.foldLeft(
      when(col(domainCol) === weights.head._1, weights.head._2 / wTotal)) {
      case (acc, (d, w)) => acc.when(col(domainCol) === d, w / wTotal)
    }.otherwise(lit(null))
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n_dom"))
      // |domains|-bounded plane: single-partition window by construction
      .withColumn("__n_tot", sum(col("__n_dom")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(graft.functions.ArrayMath.boundedKey(df))))
    df.join(broadcast(counts), domainCol)
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
      .withColumn("__thresh",
        floor(least(lit(1.0),
          col("__w") * budgetFrac * col("__n_tot") / col("__n_dom")) * nBuckets))
      .filter(hashBucket(col(idCol), nBuckets) < col("__thresh"))
      .drop("__n_dom", "__n_tot", "__w", "__thresh")
  }

  /** Per-domain targets for [[temperatureSample]] — the multilingual
    * α-sampling rule (Lample & Conneau, NeurIPS 2019; Conneau et al., ACL
    * 2020 / XLM-R): target mixture weight for domain d is
    *
    *   w_d = n_d^α / Σ_e n_e^α,   α ∈ (0, 1]
    *
    * α = 1 reproduces the natural mixture; α < 1 flattens it — head
    * domains are downsampled toward the tail, the standard fix for
    * high-resource domination of multilingual/multi-source pretraining
    * mixes. Returns one row per domain: (domainCol, n_dom, weight,
    * thresh) where thresh is the [[hashBucket]] keep-gate for a total
    * budget of budgetFrac·|df| rows (per-domain keep-rate capped at 1 —
    * tail domains can't be upsampled past their own size; the budget is
    * then under-filled, exactly like [[sampleToMixture]]).
    *
    * Cross-engine parity: the powered counts route through DECIMAL(28,12)
    * before the Σ_e sum (order-independent), and the decimal → double
    * conversions happen once — same discipline as [[dsirWeights]].
    *
    * Scale shape: ONE count aggregation; everything after lives on the
    * ≤|domains|-row plane (the global window is over domains, not rows).
    */
  def temperatureWeights(df: DataFrame, domainCol: String, alpha: Double,
                         budgetFrac: Double,
                         nBuckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]")
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac in (0,1]")
    // |domains|-bounded plane: single-partition windows by construction
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(df))
    df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_dom"))
      .withColumn("__pw",
        pow(col("n_dom").cast("double"), lit(alpha)).cast("decimal(28,12)"))
      .withColumn("__n_tot", sum(col("n_dom")).over(all))
      .withColumn("__sp", sum(col("__pw")).over(all))
      .withColumn("weight",
        col("__pw").cast("double") / col("__sp").cast("double"))
      .withColumn("thresh",
        floor(least(lit(1.0),
          col("weight") * budgetFrac * col("__n_tot") / col("n_dom"))
          * nBuckets).cast("long"))
      .select(col(domainCol), col("n_dom"), col("weight"), col("thresh"))
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total token `budget` over domains so
    * every domain is repeated at most `maxEpochs` times and the
    * remaining budget spreads UNIFORMLY over the domains that can
    * absorb it — the waterfilling alternative to [[temperatureWeights]]'
    * α-rule (which over-samples mid-size domains and still starves the
    * tail). With capacities c_d = n_d·maxEpochs sorted ascending,
    * domain k (1-based, S = prefix capacity sum, L domains) is FUNDED
    * in full iff
    *
    *   c_k·(L−k+1) + S_{k−1} ≤ budget
    *
    * (the division-free spelling of c_k ≤ (budget−S_{k−1})/(L−k+1) —
    * the funded set is a prefix because capacities ascend), and every
    * unfunded domain gets the integer water level
    * (budget − Σ_funded c) div #unfunded. All arithmetic is BIGINT —
    * bit-replayable; the ≤ L-token truncation underfill is the price.
    *
    * Scale shape: ONE aggregation over the corpus; the waterfill lives
    * entirely on the ≤|domains|-row plane (the global windows are over
    * domains, not rows — the [[temperatureWeights]] convention).
    *
    * @param tokenCol per-row token count (summed per domain)
    * @return (domainCol, n_tokens, capacity, funded, alloc_tokens,
    *         epochs) — epochs = alloc/n as double
    */
  def unimaxAllocation(df: DataFrame, domainCol: String, tokenCol: String,
                       budget: Long, maxEpochs: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    // |domains|-bounded plane: single-partition windows by construction
    val bk = graft.functions.ArrayMath.boundedKey(df)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(bk).orderBy(col("capacity"), col(domainCol))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(bk)
    import org.apache.spark.sql.expressions.Window.unboundedPreceding
    df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol)).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * maxEpochs)
      .withColumn("__k", row_number().over(wOrd).cast("long"))
      .withColumn("__L", count(lit(1)).over(all))
      .withColumn("__prefix", coalesce(
        sum(col("capacity")).over(wOrd.rowsBetween(unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("funded",
        col("capacity") * (col("__L") - col("__k") + 1L) + col("__prefix")
          <= budget)
      .withColumn("__fmass",
        sum(when(col("funded"), col("capacity")).otherwise(0L)).over(all))
      .withColumn("__nunf",
        sum(when(col("funded"), 0L).otherwise(1L)).over(all))
      .withColumn("alloc_tokens",
        when(col("funded"), col("capacity"))
          .otherwise(expr(s"(${budget}L - __fmass) div __nunf")))
      .select(col(domainCol), col("n_tokens"), col("capacity"),
        col("funded"), col("alloc_tokens"),
        (col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double")).as("epochs"))
  }

  /** Filter-disparity audit — the four-fifths (80%) rule applied to a
    * corpus gate: per group (language, source, dialect…) the gate's
    * keep rate, its ratio to the OVERALL keep rate, and a flag for
    * groups kept at under 80% of it. Quality filters tuned on English
    * silently decimate other languages (the documented failure mode of
    * classifier and heuristic gates alike); this is the one-aggregation
    * report that catches it before training.
    *
    * Exact integers to the group plane, then fixed IEEE divisions —
    * the flag compares engine-identical doubles.
    *
    * Baseline choice: the default compares each group to the OVERALL
    * keep rate (stable when group sizes are skewed — a tiny favored
    * group can't condemn everyone). The EEOC four-fifths convention
    * instead compares to the MOST-FAVORED group's rate; pass
    * `baselineMaxGroup = true` for that reading (a dominant majority
    * group can't drag the baseline down and hide disparity).
    *
    * → (groupCol, n, n_keep, keep_rate, overall_rate, ratio,
    *   below_four_fifths) — `overall_rate` holds the chosen baseline
    *   (max-group rate when `baselineMaxGroup`).
    */
  def gateDisparity(df: DataFrame, groupCol: String,
                    keepCol: String,
                    baselineMaxGroup: Boolean = false): DataFrame = {
    // |groups|-bounded plane: single-partition windows by construction
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(df))
    df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col(keepCol), 1L).otherwise(0L)), lit(0L))
          .as("n_keep"))
      .withColumn("__nt", sum(col("n")).over(all))
      .withColumn("__kt", sum(col("n_keep")).over(all))
      .withColumn("keep_rate",
        col("n_keep").cast("double") / col("n").cast("double"))
      .withColumn("overall_rate",
        if (baselineMaxGroup) max(col("keep_rate")).over(all)
        else col("__kt").cast("double") / col("__nt").cast("double"))
      .withColumn("ratio",
        when(col("overall_rate") > 0,
          col("keep_rate") / col("overall_rate")))
      .withColumn("below_four_fifths", col("ratio") < 0.8)
      .select(col(groupCol), col("n"), col("n_keep"), col("keep_rate"),
        col("overall_rate"), col("ratio"), col("below_four_fifths"))
  }

  /** Weighted sampling WITHOUT replacement, deterministic (Efraimidis &
    * Spirakis, IPL 2006 — "A-ES"): each row gets key = ln(u)/w with u a
    * hash-derived uniform in (0,1), and the k LARGEST keys are exactly
    * a w-weighted sample without replacement. Because u comes from the
    * md5-48bit recipe instead of rand(), the sample is reproducible,
    * re-partition-stable, incremental-safe — and SQL-replayable, which
    * no rand()-based sampler is.
    *
    * Scale shape: one codegen projection for the keys + a distributed
    * top-k (TakeOrderedAndProject: per-partition heaps, k rows to the
    * driver-side merge) — the corpus is never globally sorted.
    *
    * → input row + (sample_key), the k selected rows.
    */
  /** EXACT-allocation stratified sampling (Cochran, Sampling Techniques
    * §5 — proportional allocation): per stratum, keep exactly
    * max(⌊N_h·fraction⌋, min(minPerStratum, N_h)) rows — the lowest
    * md5-rank rows of the stratum — so sample sizes are deterministic
    * NUMBERS, not Bernoulli expectations (the capability [[assignSplit]]
    * / [[deterministicSample]] deliberately trade away for zero-shuffle
    * assignment): an eval-set builder that needs "exactly 20% per
    * language, at least 50 docs each" gets precisely that, stable under
    * re-partitioning and re-runs.
    *
    * Determinism: the within-stratum order is (md5(id), id) — the
    * [[sampleNegatives]] md5-uniform discipline, no rand(); the floor
    * is the same IEEE product both engines evaluate. Rows with a NULL
    * id are excluded (no deterministic rank exists for them); a NULL
    * stratum forms its own stratum.
    *
    * Scale shape: one per-stratum window pass (shuffle keyed on the
    * stratum — the standard groupBy skew caveat applies: a single
    * giant stratum funnels through one task, pre-split such strata or
    * fall back to [[deterministicSample]]); no driver traffic.
    *
    * → the sampled rows, original columns intact.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fraction: Double,
                       minPerStratum: Long = 0L): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    require(minPerStratum >= 0L,
      s"minPerStratum must be >= 0, got $minPerStratum")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol).cast("string"))
    val wAll = Window.partitionBy(col(stratumCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__nh", count(lit(1)).over(wAll))
      .withColumn("__take",
        greatest(floor(col("__nh").cast("double") * fraction).cast("long"),
          least(lit(minPerStratum), col("__nh"))))
      .filter(col("__rk") <= col("__take"))
      .drop("__rk", "__nh", "__take")
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double")
    val u = (h + lit(1.0)) / lit(281474976710658.0) // (h+1)/(2^48+2): u in (0,1)
    val key = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }

  /** Mixture-diversity report — the concentration metrics a data-mixing
    * decision reads before picking [[temperatureWeights]]' α or
    * [[unimaxAllocation]]'s budget: per-domain shares summarized as
    *
    *   - Shannon entropy H = −Σ p_s·ln p_s (nats) and the effective
    *     source count e^H (the "true diversity" of order 1)
    *   - Gini concentration over domain sizes (0 = perfectly even,
    *     →1 = one domain dominates)
    *   - Herfindahl–Hirschman index Σ p_s² (the order-2 dual of e^H)
    *
    * Exactness: each entropy term is one division + one ln of
    * integer-derived doubles cast to DECIMAL(18,12) before summing (the
    * q106/q109 cross-engine ln recipe — order-independent sum, bit-equal
    * terms); Gini and HHI stay in INTEGER/DECIMAL(38,0) arithmetic
    * (rank·n and n² sums) until a fixed sequence of IEEE divisions.
    *
    * Scale shape: ONE aggregation over the corpus to the domain plane;
    * ranks, global windows and the final reduction all run on that
    * ≤|domains|-row frame (the [[temperatureWeights]] convention — the
    * partition-less windows are over domains, never rows).
    *
    * → one row (n_total, n_sources, entropy, eff_sources, gini, hhi)
    */
  def mixtureDiversity(df: DataFrame, domainCol: String): DataFrame = {
    // |domains|-bounded plane: single-partition windows by construction
    val bk = graft.functions.ArrayMath.boundedKey(df)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(bk)
    val byDom = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val ranked = byDom
      .withColumn("__i", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(bk)
          .orderBy(col("__n"), col(domainCol))).cast("long"))
      // NOTE: "__N" would case-insensitively REPLACE "__n" in withColumn
      .withColumn("__tot", sum(col("__n")).over(all))
      .withColumn("__nsrc", count(lit(1)).over(all))
      .withColumn("__ent_term",
        ((col("__n").cast("double") / col("__tot").cast("double")) *
          log(col("__n").cast("double") / col("__tot").cast("double")))
          .cast("decimal(18,12)"))
    ranked.agg(
        max(col("__tot")).as("n_total"),
        max(col("__nsrc")).as("n_sources"),
        (-sum(col("__ent_term"))).as("__ent_sum"),
        sum(col("__i").cast("decimal(38,0)") * col("__n")).as("__gnum"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__h2"))
      .select(col("n_total"), col("n_sources"),
        col("__ent_sum").cast("string").cast("double").as("entropy"),
        exp(col("__ent_sum").cast("string").cast("double"))
          .as("eff_sources"),
        ((lit(2.0) * col("__gnum").cast("string").cast("double") -
          ((col("n_sources") + 1) * col("n_total")).cast("double")) /
          (col("n_sources") * col("n_total")).cast("double")).as("gini"),
        (col("__h2").cast("string").cast("double") /
          col("n_total").cast("double") / col("n_total").cast("double"))
          .as("hhi"))
  }

  /** Temperature-scaled mixture sampling: keep rows whose [[hashBucket]]
    * falls under their domain's [[temperatureWeights]] gate — hash-gated
    * (reproducible, repartition-stable, incremental-safe: the
    * [[sampleToMixture]] guarantees), with the target mixture COMPUTED
    * from the data by the α rule instead of hand-specified weights.
    * Domain stats broadcast; the corpus never shuffles.
    */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
                        alpha: Double, budgetFrac: Double,
                        nBuckets: Int = 10000): DataFrame = {
    val w = temperatureWeights(df, domainCol, alpha, budgetFrac, nBuckets)
      .select(col(domainCol), col("thresh"))
    df.join(broadcast(w), domainCol)
      .filter(hashBucket(col(idCol), nBuckets) < col("thresh"))
      .drop("thresh")
  }

  /** Fixed-size token chunking with overlap — the window split RAG/
    * pretraining prep runs before embedding or packing. Chunk i covers
    * tokens [i·step, i·step + chunkTokens) with step = chunkTokens −
    * overlap; the last chunk may be shorter; a doc shorter than one chunk
    * yields exactly one chunk.
    *
    * A start offset is emitted only while it still contributes a NEW token
    * (start + overlap < n): a trailing window whose content lies entirely
    * inside its predecessor's overlap is redundant and skipped — so the
    * start bound is n − overlap − 1, inclusive.
    *
    * Plan: the token array is materialized ONCE per row into a column and
    * the per-chunk `slice` reads that attribute — never re-tokenizes (the
    * interpreted-HOF nesting trap documented on [[TextOps.tokenShingles]]).
    * One Generate (explode of the start offsets), zero shuffles, zero
    * joins: scales as a pure projection.
    *
    * @return (idCol, chunk_id, n_tokens, chunk_text) — one row per chunk
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > overlap >= 0")
    val step = chunkTokens - overlap
    val toked = df.select(col(idCol),
      TextOps.tokens(TextOps.normalized(col(textCol))).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    toked
      .withColumn("__start",
        explode(sequence(lit(0),
          greatest(lit(0), col("__n") - (overlap + 1)), lit(step))))
      .select(col(idCol),
        (col("__start") / step).cast("long").as("chunk_id"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
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
    val evalShingles = docShingles(eval, idCol, textCol, shingleSize)
      .select(col("__sh")).distinct()
    docShingles(train, idCol, textCol, shingleSize)
      .join(evalShingles, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[contaminatedDocs]] for a LARGE eval side — same EXACT result,
    * different scale shape. The plain flavor relies on AQE broadcasting
    * the distinct eval shingles; past the broadcast threshold (tens of
    * millions of shingles) that join degrades to shuffling EVERY training
    * shingle. Here the eval shingles are first folded into a Bloom filter
    * (~1.2 bytes/shingle at fpp=1% — an order of magnitude under a hash
    * set, and sized by a driver-side scalar count, never a collect of the
    * set), the training side is pruned by a codegen'd
    * [[graft.functions.BloomMightContain]] probe BEFORE any exchange, and
    * only the surviving ~(contaminated + fpp) fraction reaches the exact
    * confirm join that kills the false positives. No false negatives, so
    * result == contaminatedDocs row-for-row (spec-asserted).
    */
  def contaminatedDocsBloom(train: DataFrame, eval: DataFrame, idCol: String,
                            textCol: String, shingleSize: Int = 3,
                            minShared: Long = 1L,
                            fpp: Double = 0.01): DataFrame = {
    import graft.functions.ArrayMath
    val evalShingles = docShingles(eval, idCol, textCol, shingleSize)
      .select(col("__sh")).distinct()
    val nEval = evalShingles.count() // driver scalar (one long), sizes the filter
    val bloom = evalShingles.stat.bloomFilter("__sh", math.max(nEval, 1L), fpp)
    val bits = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    docShingles(train, idCol, textCol, shingleSize)
      .filter(ArrayMath.bloomMightContain(col("__sh"), bits))
      .join(evalShingles, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deterministic RANDOM negative sampling for contrastive training —
    * the uniform complement of `Similarity.hardNegatives`: for each
    * anchor, up to `k` pseudo-random different-label rows, selected by
    * md5 position probing (the [[hashBucket]] discipline, so sampling is
    * reproducible across reruns and partitionings, incremental-safe, and
    * SQL-replayable — no rand()). Slots whose probed row has the same
    * label (or is the anchor itself) are DROPPED, not retried: expected
    * yield is k·(1 − 1/|labels|) per anchor — over-provision k rather
    * than loop (a retry chain would be a data-dependent plan).
    *
    * Scale shape: positions from [[ScaleOps.contiguousIds]] (no global
    * single-task window), anchors explode to k skinny probe rows, ONE
    * equi join on position. Null-label rows are excluded from both
    * sides.
    *
    * @return (anchor_id, slot 0..k-1, neg_id)
    */
  def sampleNegatives(df: DataFrame, idCol: String, labelCol: String,
                      k: Int, seed: Long = 42L,
                      numPartitions: Int = 64): DataFrame = {
    require(k >= 1, "k must be positive")
    val labeled = df.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol))
    val n = labeled.count() // scalar modulo base — one long to the driver
    require(n >= 2, s"need at least 2 labeled rows, got $n")
    val pos = graft.ops.ScaleOps.contiguousIds(labeled, Seq(idCol),
      numPartitions, "__pos")
    pos.select(col(idCol).as("anchor_id"), col(labelCol).as("__la"))
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__tp", conv(substring(md5(concat_ws(":",
          col("anchor_id"), col("slot"), lit(seed))), 1, 8), 16, 10)
        .cast("long") % n)
      .join(pos.select(col("__pos").as("__tp"), col(idCol).as("neg_id"),
        col(labelCol).as("__lb")), "__tp")
      .filter(col("neg_id") =!= col("anchor_id") && col("__la") =!= col("__lb"))
      .select(col("anchor_id"), col("slot"), col("neg_id"))
  }

  /** Train/test split LEAKAGE audit (Brown et al. 2020, GPT-3 App. C —
    * the published train-test-overlap report): assign splits with the
    * SAME deterministic hash rule as [[assignSplit]], then report every
    * `testSplit` document that shares n-gram shingles with the
    * `trainSplit`, with its shared-shingle count. Splits are selected BY
    * NAME (a positional rule would silently audit the wrong split under
    * a reordered `splits` list). The eval-hygiene complement to
    * [[contaminatedDocs]] (which gates against an EXTERNAL eval set):
    * this one audits the pipeline's own split for leakage introduced by
    * near-duplicates straddling the split boundary.
    *
    * Scale shape: the overlap runs through [[contaminatedDocsBloom]] —
    * the shingle side here is the TRAIN split, by far the largest slice,
    * exactly the "LARGE eval side" case the Bloom flavor exists for
    * (identical rows to the plain flavor, spec-asserted).
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)] =
                     Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                   shingleSize: Int = 3, nBuckets: Int = 10000,
                   trainSplit: String = "train",
                   testSplit: String = "test"): DataFrame = {
    val names = splits.map(_._1)
    require(names.contains(trainSplit) && names.contains(testSplit),
      s"splits must contain '$trainSplit' and '$testSplit' (got $names)")
    val assigned = assignSplit(df, idCol, splits, nBuckets)
    contaminatedDocsBloom(
      assigned.filter(col("split") === testSplit),
      assigned.filter(col("split") === trainSplit),
      idCol, textCol, shingleSize)
  }

  /** Shared decontamination projection: doc → exploded DISTINCT n-gram
    * shingle hashes (identity = 64-bit hash, as in
    * [[Dedup.ngramJaccardPairs]]; collisions negligible, distinct counts
    * coincide with string shingles).
    */
  private def docShingles(d: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int): DataFrame = {
    import graft.functions.ArrayMath
    d.select(col(idCol), array_distinct(ArrayMath.shingleHashes(
        TextOps.tokens(TextOps.normalized(col(textCol))), shingleSize)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col(idCol), explode(col("__shs")).as("__sh"))
  }

  /** Hashed unigram+bigram feature occurrences — DSIR's bag-of-hashed-
    * ngrams model: one row per token and per adjacent token pair, bucketed
    * over the n-gram string (bigrams joined by one space).
    *
    * `scaleHash = false` (default) buckets via [[hashBucket]] (md5) so a
    * SQL oracle replays every occurrence; `scaleHash = true` buckets via
    * `pmod(xxhash64, nBuckets)` — the 100 TB flavor (xxhash64 is a
    * codegen'd 64-bit mix, ~an order of magnitude cheaper per gram than
    * md5's cryptographic digest + hex decode) — same distributional
    * behavior, certified against the md5 flavor by selection-overlap
    * tests (the [[Dedup.crossDocSpans]] pluggable-hash precedent).
    */
  private[graft] def hashedNgrams(d: DataFrame, cols: Seq[Column], textCol: String,
                           nBuckets: Int, scaleHash: Boolean = false): DataFrame = {
    // blank docs carry no features (split('') is [''], a phantom token)
    val t = d.filter(length(TextOps.normalized(col(textCol))) > 0)
      .select(cols :+ TextOps.tokens(TextOps.normalized(col(textCol)))
        .as("__t"): _*)
    // sequence(1, n) DESCENDS when n < 1, so the bigram arm must be gated
    // on >= 2 tokens (a 1-token doc otherwise grows a phantom bigram)
    val bigrams = when(size(col("__t")) >= 2,
      transform(sequence(lit(1), size(col("__t")) - 1),
        i => concat_ws(" ", element_at(col("__t"), i),
          element_at(col("__t"), i + lit(1)))))
      .otherwise(array().cast("array<string>"))
    val grams = t.select(cols :+ explode(concat(col("__t"), bigrams))
      .as("__g"): _*)
    val bucket =
      if (scaleHash) pmod(xxhash64(col("__g")), lit(nBuckets.toLong))
      else hashBucket(col("__g"), nBuckets)
    grams.select(cols :+ bucket.as("__b"): _*)
  }

  /** DSIR importance log-weights (Xie, Santurkar, Ma & Liang, NeurIPS 2023
    * — "Data Selection for Language Models via Importance Resampling"):
    * score each raw-corpus document by how much more likely its hashed
    * unigram+bigram profile is under the TARGET corpus's bag-of-hashed-
    * ngrams distribution than under the raw corpus's own:
    *
    *   logw(doc) = Σ_occurrences [ ln(T_b + a) − ln(R_b + a) + C ],
    *   C = ln(Rtot + a·B) − ln(Ttot + a·B)
    *
    * where T_b / R_b are target / raw bucket counts, a the add-k smoothing
    * mass, and B = nBuckets — each occurrence term one ln of exact
    * integer-derived ratios (the q106/q109 cross-engine parity recipe),
    * routed through DECIMAL(18,12) before the per-doc sum so partial-agg
    * order cannot change the result.
    *
    * Output: one row per raw doc — (idCol, n_features, log_weight
    * rounded to 6 dp); empty docs report n_features = 0, NULL weight.
    *
    * Scale shape: the two distribution tables aggregate to ≤ B buckets —
    * a PARAMETER, not a corpus quantity — so the λ table (raw buckets
    * left-joined with target counts) is broadcast by construction; the
    * corpus-side plan is explode → broadcast join → one skinny (id)
    * aggregation with map-side partial combine. No corpus-scale shuffle
    * other than the per-doc rollup.
    */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
                  target: DataFrame, targetTextCol: String,
                  nBuckets: Int = 10000, smoothing: Double = 1.0,
                  scaleHash: Boolean = false,
                  cacheFeatures: Boolean = true): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    require(smoothing > 0, "smoothing mass must be positive")
    // the occurrence frame feeds BOTH the bucket-count aggregation and
    // the per-doc scoring join — caching it runs the corpus
    // tokenize+hash pass once, not twice (skinny (id, bucket) pairs,
    // spill-safe MEMORY_AND_DISK). The returned value is a PLAN, so the
    // entry cannot be unpersisted here and lives until session end
    // (CacheManager dedupes identical plans, so re-running the same
    // input reuses one entry — but DISTINCT corpora each add one).
    // Long-lived services scoring many corpora should pass
    // `cacheFeatures = false` (recompute instead of cache) or
    // `spark.catalog.clearCache()` between corpora.
    val rawFeats0 = hashedNgrams(raw, Seq(col(idCol)), textCol, nBuckets, scaleHash)
    val rawFeats = if (cacheFeatures) rawFeats0.persist() else rawFeats0
    val rCounts = rawFeats.groupBy(col("__b")).agg(count(lit(1)).as("__rc"))
    val tCounts = hashedNgrams(target, Nil, targetTextCol, nBuckets, scaleHash)
      .groupBy(col("__b")).agg(count(lit(1)).as("__tc"))
    // totals BEFORE the bucket join (target mass outside raw's buckets
    // still belongs in Ttot); one broadcast row
    val totals = rCounts.agg(sum(col("__rc")).as("__rtot"))
      .crossJoin(tCounts.agg(sum(col("__tc")).as("__ttot")))
    val lambda = rCounts.join(tCounts, Seq("__b"), "left")
      .select(col("__b"),
        (log((coalesce(col("__tc"), lit(0L)) + lit(smoothing)))
          - log(col("__rc") + lit(smoothing))).as("__lr"))
    val term = (col("__lr")
      + log(col("__rtot") + lit(smoothing * nBuckets))
      - log(col("__ttot") + lit(smoothing * nBuckets))).cast("decimal(18,12)")
    val scored = rawFeats
      .join(broadcast(lambda), Seq("__b"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(term).as("__s"))
      .select(col(idCol), col("n_features"),
        round(col("__s").cast("double"), 6).as("log_weight"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"), col("log_weight"))
  }

  /** Deterministic token-balanced training-shard assignment — the
    * pipeline-ENDING step: the curated corpus becomes N shards a training
    * job streams, each carrying ~total/N tokens, in a deterministic
    * "global shuffle" order (training wants documents decorrelated from
    * ingest order, and re-runs must produce byte-identical shards).
    *
    * Order = (md5(id), id): engine-replayable, layout-invariant, and as
    * good as random for decorrelation (the [[hashBucket]] rationale —
    * never rand()). Shard boundary = pure integer arithmetic on the
    * running token count BEFORE each doc:
    *
    *   shard(doc) = min(nShards − 1, ⌊cumBefore · nShards / total⌋)
    *
    * so shards are contiguous runs of the hash order with token sums
    * within one document of perfect balance — the greedy rule an oracle
    * replays with one window cumsum.
    *
    * Scale shape: the [[graft.ops.ScaleOps.contiguousIds]] mechanism
    * generalized to weights — range-repartition by hash, ONE pass for
    * per-partition token sums (numPartitions longs to the driver), one
    * pass assigning shards from running offsets. No global sort, no
    * single-task window, no corpus-scale collect.
    *
    * @param weightCol integer token/byte count per row (cast to long)
    * @return input columns + `shard_id` (long in [0, nShards))
    */
  def tokenShards(df: DataFrame, idCol: String, weightCol: String,
                  nShards: Int, numPartitions: Int = 64): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    require(numPartitions >= 1, "numPartitions must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    // localCheckpoint PINS the range partitioning: the per-partition
    // offsets collected in pass 1 are only valid against the exact
    // partition layout pass 2 reads — a recomputed repartitionByRange
    // could re-sample different range bounds and silently mis-shard
    val arranged = df
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .repartitionByRange(numPartitions, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
      .localCheckpoint()
    val wIdx = arranged.schema.fieldIndex("__w")
    // pass 1: per-partition token sums — numPartitions longs, bounded
    val partSums = arranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(wIdx)); Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val total = offsets.last
    // pass 2: running offset within each partition → shard id
    val schema = arranged.schema.add("shard_id", LongType, nullable = false)
    val assigned = arranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { r =>
        val shard =
          if (total == 0L) 0L
          else math.min(nShards - 1L, run * nShards / total)
        run += r.getLong(wIdx)
        Row.fromSeq(r.toSeq :+ shard)
      }
    }
    arranged.sparkSession.createDataFrame(assigned, schema)
      .drop("__w", "__h")
  }

  /** DSIR selection: the top-k raw documents by [[dsirWeights]]. The paper
    * perturbs log-weights with Gumbel noise before top-k (importance
    * RESAMPLING); this flavor ranks the ROUNDED weight with the id as
    * tiebreak — deterministic across runs, partitionings and engines (the
    * repo-wide no-rand() discipline), same selection shape. Plan: the
    * weights pass + one TakeOrderedAndProject (never a global sort).
    */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String, k: Int,
                 nBuckets: Int = 10000, smoothing: Double = 1.0,
                 scaleHash: Boolean = false): DataFrame = {
    require(k >= 1, "k must be positive")
    dsirWeights(raw, idCol, textCol, target, targetTextCol, nBuckets, smoothing,
      scaleHash)
      .filter(col("log_weight").isNotNull)
      .orderBy(col("log_weight").desc, col(idCol))
      .limit(k)
  }

  /** Pipeline-ENDING delivery sink: write a corpus as sharded JSONL
    * (one `shard=<k>/` directory per training shard, one JSON object
    * per line) plus an integrity MANIFEST the consuming trainer can
    * verify without trusting the transfer: per shard, the line count,
    * total line bytes (newlines included) and an ORDER-INSENSITIVE
    * content hash (sum of per-line xxhash64 routed through
    * DECIMAL(38,0) — ANSI mode forbids wrapping long sums, and the
    * decimal headroom is ~10^19 lines per shard; files may be
    * concatenated/recombined in any order without breaking the check,
    * a flipped byte still breaks it).
    *
    * Composes with [[tokenShards]]: assign shards there, join the
    * assignment on, write here. One partitioned text write + one
    * aggregation over the lines — the corpus never collects.
    *
    * @return the manifest (shard, n_lines, n_bytes, content_hash),
    *         also persisted at `path/_graft_manifest` (parquet).
    */
  def writeJsonlShards(df: DataFrame, shardCol: String,
                       path: String): DataFrame = {
    val spark = df.sparkSession
    // persisted: the files and the manifest are two actions over one
    // frame — under a nondeterministic upstream they must not diverge
    // (the saveIndex lists/refine precedent)
    val lines = df
      .select(col(shardCol).cast("long").as("shard"),
        to_json(struct(df.columns.filter(_ != shardCol).map(col): _*))
          .as("value"))
      .persist()
    try {
      lines.write.mode("overwrite").partitionBy("shard").text(path)
      val manifest = lines
        .groupBy("shard")
        .agg(count(lit(1)).as("n_lines"),
          sum(octet_length(col("value")).cast("long") + lit(1L))
            .as("n_bytes"),
          sum(xxhash64(col("value")).cast("decimal(38,0)"))
            .as("content_hash"))
      manifest.coalesce(1).write.mode("overwrite")
        .parquet(path + "/_graft_manifest")
      spark.read.parquet(path + "/_graft_manifest")
    } finally { lines.unpersist(false); () }
  }

  /** Re-derive the manifest from the files on disk and diff it against
    * the persisted one — the consumer-side integrity check. Returns one
    * row per shard with both sides and an `ok` verdict; a shard missing
    * on either side reports ok = false.
    */
  def verifyJsonlShards(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame = {
    val actual = spark.read.text(path)
      .withColumn("shard",
        regexp_extract(input_file_name(), "shard=(\\d+)", 1).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("a_lines"),
        sum(octet_length(col("value")).cast("long") + lit(1L))
          .as("a_bytes"),
        sum(xxhash64(col("value")).cast("decimal(38,0)")).as("a_hash"))
    val expected = spark.read.parquet(path + "/_graft_manifest")
    expected.join(actual, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_lines"), col("a_lines"),
        col("n_bytes"), col("a_bytes"),
        (col("n_lines") <=> col("a_lines") &&
          col("n_bytes") <=> col("a_bytes") &&
          col("content_hash") <=> col("a_hash")).as("ok"))
  }

  /** DoReMi-style domain reweighting (Xie et al., NeurIPS 2023 "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * the exponentiated-gradient / Group-DRO iterate over per-domain
    * excess losses. Per step t the domain weights are the softmax of the
    * cumulative scaled excess loss
    *
    *   S_d(t) = η · Σ_{s ≤ t} max(excess_d(s), 0)
    *
    * and the returned mixture is DoReMi's final output: the AVERAGE of
    * the per-step softmax iterates α_t (smoothing constant c = 0 — the
    * paper's uniform-smoothing mix is one affine step the caller can
    * apply). Rows sharing a (domain, step) cell are summed; a domain
    * absent at a step contributes zero excess that step but keeps its
    * carried potential inside every softmax (the grid is densified).
    *
    * Exactness: excess is clipped/summed in DECIMAL(28,12); η must be
    * exactly representable at ≤ 2 decimal digits (0.25, 0.5, 1 — the
    * paper's regime) so the per-cell scaled excess is an exact
    * DECIMAL(22,14) and every cumulative S an exact decimal sum; each
    * softmax is max-stabilized (exp operands ≤ 0, so exp ∈ (0,1]) with
    * the exp/div results cast to DECIMAL(18,12) — the q106/q109
    * cross-engine recipe: bit-equal terms, then only order-independent
    * decimal sums.
    *
    * Scale shape: ONE aggregation over the corpus to the
    * |domains|·|steps| cell plane (mixture runs have ~10–100 domains and
    * the proxy run's step count — a skinny ≤1e8-row frame at the far
    * extreme), then windows partitioned by domain (cumsum) and by step
    * (softmax). No driver-side iteration: the whole EG trajectory is two
    * window passes.
    *
    * → one row per domain: (domainCol, excess_total, weight_avg,
    *   weight_final) — weight_avg is the DoReMi mixture, weight_final
    *   the last iterate.
    */
  def domainReweight(losses: DataFrame, domainCol: String, stepCol: String,
                     excessCol: String, eta: Double = 0.25): DataFrame = {
    require(eta > 0, s"eta must be > 0, got $eta")
    val etaBd = java.math.BigDecimal.valueOf(eta)
    require(etaBd.stripTrailingZeros.scale <= 2,
      s"eta must be exactly representable at <= 2 decimal digits, got $eta")
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(18,12)")
    val clipped = greatest(col(excessCol).cast("decimal(18,12)"), zero)
    val cells = losses
      .groupBy(col(domainCol), col(stepCol))
      .agg(sum(clipped).cast("decimal(28,12)").as("__ex"),
        // fold η in per cell: (18,12)·(≤3,≤2) stays exact at 14 dp
        sum((clipped * lit(etaBd)).cast("decimal(22,14)"))
          .cast("decimal(30,14)").as("__exs"))
    // densify: every domain carries its potential through every step
    val domains = cells.select(col(domainCol)).distinct()
    val steps = cells.select(col(stepCol)).distinct()
    val grid = domains.crossJoin(broadcast(steps))
      .join(cells, Seq(domainCol, stepCol), "left")
      .withColumn("__ex", coalesce(col("__ex"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(28,12)")))
      .withColumn("__exs", coalesce(col("__exs"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(30,14)")))
    val wCum = Window.partitionBy(col(domainCol)).orderBy(col(stepCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wStep = Window.partitionBy(col(stepCol))
    val scored = grid
      .withColumn("__s", sum(col("__exs")).over(wCum))
      .withColumn("__mx", max(col("__s")).over(wStep))
      .withColumn("__ez",
        exp((col("__s") - col("__mx")).cast("double")).cast("decimal(18,12)"))
      .withColumn("__z", sum(col("__ez")).over(wStep))
      .withColumn("__alpha",
        (col("__ez").cast("double") / col("__z").cast("double"))
          .cast("decimal(18,12)"))
    scored.groupBy(col(domainCol))
      .agg(
        sum(col("__ex")).cast("double").as("excess_total"),
        (sum(col("__alpha")).cast("double") /
          count(lit(1)).cast("double")).as("weight_avg"),
        max_by(col("__alpha"), col(stepCol)).cast("double")
          .as("weight_final"))
  }
}
