package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the ANALYZE-style pass a pipeline runs before
  * deciding partitioning, skew handling, and quality gates on a new corpus.
  */
object Profile {

  /** One-call corpus DATASHEET (Gebru et al., "Datasheets for Datasets",
    * CACM 2021 — the release-documentation artifact every public training
    * corpus ships): a single wide row of the headline corpus facts —
    * document / source / language counts, exact-duplicate count (md5
    * fingerprint), token totals and mean, char extremes, short-doc count.
    * Every field is an exact integer or one integer division, so the
    * whole row replays in SQL; each piece is the spelling its standalone
    * query certifies (q15/q21/q22/q23 precedents).
    *
    * Plan shape: ONE aggregation pass — the three exact distincts plan as
    * a single Expand (input scanned once, map-side combined), everything
    * else piggybacks; output is one row regardless of corpus size.
    */
  def corpusDatasheet(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, sourceCol: String): DataFrame = {
    val toks = TextOps.tokenCount(col(textCol))
    docs.select(col(langCol), col(sourceCol), toks.as("__t"),
        length(col(textCol)).as("__nc"),
        TextOps.fingerprintMd5(col(textCol)).as("__fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col(sourceCol)).as("n_sources"),
        countDistinct(col(langCol)).as("n_langs"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("n_exact_dup_docs"),
        sum(col("__t")).cast("long").as("total_tokens"),
        (sum(col("__t")).cast("double") / count(lit(1))).as("avg_tokens"),
        min(col("__nc")).cast("long").as("min_chars"),
        max(col("__nc")).cast("long").as("max_chars"),
        sum(when(col("__t") < 50, 1L).otherwise(0L)).as("n_short_docs"))
  }

  /** Per-column numeric profile: row count, nulls, distinct count,
    * min/max — one row per profiled column.
    *
    * Plan shape: ONE aggregation statement for all columns. With exact
    * distincts Spark plans the k distinct aggregates with a single Expand
    * (each input row fans to k tagged rows, map-side combined), so the
    * input is scanned once — instead of k separate jobs. min/max/count
    * piggyback on the same pass. The result is k tiny structs exploded
    * into rows on the driver side of the agg — no second shuffle.
    *
    * `approxDistinct = true` is the 100 TB path: HyperLogLog++ sketches
    * (±~2.3% rsd) replace the distinct aggregation entirely — no Expand
    * (input rows are NOT fanned ×k), no per-value distinct state, constant
    * memory per column. Exact mode is the oracle-checkable default; the
    * approx flavor is for profiling high-cardinality columns at corpus
    * scale, where exact distinct state is the dominant cost.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    def nd(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        nd(c).as(s"__nd_$c"),
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

  /** Pairwise Pearson correlation over `cols`, ONE aggregation pass.
    *
    * Why not `corr()`: built-in corr accumulates doubles, so the result
    * depends on partition order — fine for analytics, fatal for an
    * engine-reproducibility contract. Here every sum (Σx, Σx², Σxy) runs in
    * DECIMAL (exact, commutative — any partial-agg order gives the same
    * value), and only the final closed form
    *   (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ᵗᵒᵗ) · √(n·Σy² − Σy²ᵗᵒᵗ))
    * runs in IEEE doubles — a fixed expression tree both engines evaluate
    * identically from identical inputs.
    *
    * Plan: k + k + C(k,2) decimal sums in one HashAggregate over one scan
    * (no Expand — nothing is distinct), then a driver-free explode of the
    * C(k,2) pair structs. Rows with a NULL in either column of a pair drop
    * from that pair's sums (matching SQL corr semantics) via per-pair
    * conditional aggregation.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
                        scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = s"decimal(18,$scale)"
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // Pre-project every decimal value ONCE per row — k casts, k squares,
    // C(k,2) cross products — and let the aggregates be plain masked sums
    // over these columns. The naive spelling (cast/multiply inside every
    // conditional aggregate) does 3·C(k,2) decimal multiplies per row;
    // decimal multiplication at precision 37 is BigDecimal-backed and
    // dominated this operator's runtime (measured 9.5 s → see q77). The
    // per-pair null masks still select from the SHARED products, so the
    // pairwise-deletion semantics are unchanged.
    def dcol(c: String) = s"__d_$c"
    def sqcol(c: String) = s"__sq_$c"
    def xcol(p: Int) = s"__xp_$p"
    val projected = df.select(
      cols.map(c => col(c).isNotNull.as(s"__nn_$c")) ++
        cols.map(c => col(c).cast(dec).as(dcol(c))) ++
        cols.map(c => (col(c).cast(dec) * col(c).cast(dec)).as(sqcol(c))) ++
        pairs.zipWithIndex.map { case ((x, y), p) =>
          (col(x).cast(dec) * col(y).cast(dec)).as(xcol(p))
        }: _*)
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), p) =>
      val both = col(s"__nn_$x") && col(s"__nn_$y")
      Seq(
        count(when(both, 1)).as(s"__n_$p"),
        sum(when(both, col(dcol(x)))).as(s"__sx_$p"),
        sum(when(both, col(dcol(y)))).as(s"__sy_$p"),
        sum(when(both, col(sqcol(x)))).as(s"__sxx_$p"),
        sum(when(both, col(sqcol(y)))).as(s"__syy_$p"),
        sum(when(both, col(xcol(p)))).as(s"__sxy_$p"))
    }
    val agged = projected.agg(aggs.head, aggs.tail: _*)
    val pairStructs = pairs.zipWithIndex.map { case ((x, y), p) =>
      val n = col(s"__n_$p").cast("double")
      def dbl(pre: String) = col(s"__${pre}_$p").cast("double")
      val num = n * dbl("sxy") - dbl("sx") * dbl("sy")
      val den = sqrt(n * dbl("sxx") - dbl("sx") * dbl("sx")) *
        sqrt(n * dbl("syy") - dbl("sy") * dbl("sy"))
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"__n_$p").as("n"),
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(round(num / den, 6)).as("corr"))
    }
    agged.select(explode(array(pairStructs: _*)).as("__s")).select(col("__s.*"))
  }

  /** Per-group z-score outliers: rows whose value deviates more than
    * `zThreshold` population standard deviations from their group mean —
    * the basic anomaly gate a pipeline runs on metric streams.
    *
    * Engine-reproducible like [[correlationMatrix]]: all group sums run in
    * DECIMAL (order-independent), the final mean/std/z are a fixed IEEE
    * expression tree.
    *
    * Numerics: the naive one-pass E[x²]−mean² cancels catastrophically
    * when |mean| ≫ std (a 1e8-magnitude metric with unit spread loses ALL
    * variance digits in doubles — every row silently classified
    * non-outlier, exactly the regime an anomaly gate exists for). Instead
    * the moments are computed on SHIFTED values d = x − min(group): now
    * E[d²] and (E[d])² are the same order of magnitude (both ~range²), so
    * the subtraction loses at most a couple of bits. The shift also keeps
    * Σd² small — no decimal overflow risk from squaring large raw values.
    * Cost: one extra aggregate pass for the per-group min (both passes are
    * map-side-combined shuffles of |groups|-sized partials; the group min
    * broadcasts back, so the full data still never shuffles).
    *
    * `broadcastStats` (default true) forces the two |groups|-sized stats
    * frames to broadcast — right for the documented use (metric streams
    * with bounded group cardinality). With PER-ENTITY groups in the tens
    * of millions the forced broadcast becomes the failure point: pass
    * false and the joins fall back to whatever AQE picks from the runtime
    * sizes (shuffled hash / sort-merge), keyed on the same group column.
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     zThreshold: Double = 3.0, scale: Int = 4,
                     broadcastStats: Boolean = true): DataFrame = {
    require(zThreshold > 0, "zThreshold must be positive")
    def maybeBroadcast(stats: DataFrame) =
      if (broadcastStats) broadcast(stats) else stats
    val dec = s"decimal(18,$scale)"
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast(dec).as("__x"))
    // pass 1: per-group shift (decimal min — exact, order-independent)
    val shifts = vals.groupBy(col(groupCol)).agg(min(col("__x")).as("__shift"))
    // pass 2: decimal moments of d = x − shift; d ≥ 0 and bounded by the
    // group range, so d² stays far from decimal(38) overflow
    val d = (col("__x") - col("__shift")).cast(dec)
    val stats = vals.join(maybeBroadcast(shifts), Seq(groupCol))
      .select(col(groupCol), col("__shift"), d.as("__d"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(col("__shift")).as("__shift"),
        sum(col("__d")).as("__sd"), sum(col("__d") * col("__d")).as("__ssd"))
      .withColumn("__meanD", col("__sd").cast("double") / col("__n"))
      .withColumn("__var",
        col("__ssd").cast("double") / col("__n") - col("__meanD") * col("__meanD"))
      .select(col(groupCol), col("__n"),
        (col("__shift").cast("double") + col("__meanD")).as("__mean"),
        sqrt(greatest(col("__var"), lit(0.0))).as("__std"))
    df.join(maybeBroadcast(stats), groupCol)
      .filter(col("__std") > 0.0 &&
        abs(col(valueCol) - col("__mean")) > lit(zThreshold) * col("__std"))
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__std"), 4))
      .drop("__n", "__mean", "__std")
  }

  /** Tukey-fence (IQR) outlier gate — [[zscoreOutliers]]'s distribution-
    * robust sibling: a row is an outlier when its value leaves
    * [q1 − k·IQR, q3 + k·IQR] for its group (k = 1.5 classic). Quartiles
    * are exact `percentile` aggregates ROUNDED to `roundScale` decimals
    * before the fence arithmetic, because exact interpolated percentiles
    * are the one aggregate whose last-ulp value is interpolation-order
    * dependent across engines — rounding makes the fences (and therefore
    * the verdict set) engine-reproducible, the q42-proven parity. One
    * aggregate pass + one join back (`broadcastStats` as in
    * [[zscoreOutliers]]: |groups|-sized frame, forced broadcast is
    * opt-out for per-entity cardinalities). Appends `lo`/`hi` fence
    * columns to the surviving outlier rows. At 100 TB swap the exact
    * percentile for `percentile_approx` and keep the plan.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 1.5, roundScale: Int = 4,
                  broadcastStats: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val stats = df.groupBy(col(groupCol)).agg(
      round(expr(s"percentile($valueCol, 0.25)"), roundScale).as("__q1"),
      round(expr(s"percentile($valueCol, 0.75)"), roundScale).as("__q3"))
      .withColumn("lo", col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("hi", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .drop("__q1", "__q3")
    val maybe = if (broadcastStats) broadcast(stats) else stats
    df.join(maybe, groupCol)
      .filter(col(valueCol) < col("lo") || col(valueCol) > col("hi"))
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

  /** Population-Stability-Index drift between two snapshots of a numeric
    * column over the SAME fixed bins ([[fixedHistogram]]'s edges — fixed,
    * not data-derived, so A and B are binned identically and the result
    * reproduces across engines):
    *
    *   PSI = Σ_b (pA_b − pB_b) · ln(pA_b / pB_b),
    *   p_b = (n_b + 1) / (N + nBins)   (Laplace — empty bins stay finite)
    *
    * The industry drift gate (>0.25 = major shift, >0.1 = watch). Every
    * ln argument is an exact integer, so the term decomposes into four
    * ln's of integers (the q122 NB recipe) and the sum DECIMAL-routes —
    * bit-stable under any partitioning and DuckDB-replayable. Cost: two
    * histogram aggregations + an nBins-row join; the snapshots never
    * co-shuffle.
    *
    * @return one row: (n_a, n_b, psi, drifted)
    */
  def psiDrift(a: DataFrame, b: DataFrame, c: String, lo: Double,
               width: Double, nBins: Int,
               threshold: Double = 0.25): DataFrame = {
    val bins = a.sparkSession.range(nBins).select(col("id").as("bin"))
    def hist(df: DataFrame, n: String) =
      fixedHistogram(df, c, lo, width, nBins).withColumnRenamed("n", n)
    val joined = bins
      .join(hist(a, "__na"), Seq("bin"), "left")
      .join(hist(b, "__nb"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__na"), lit(0L)).as("na"),
        coalesce(col("__nb"), lit(0L)).as("nb"))
    val tot = joined.agg(sum("na").as("__ta"), sum("nb").as("__tb"))
    val k = lit(nBins.toLong)
    val term =
      (((col("na") + 1).cast("double") / (col("__ta") + k) -
        (col("nb") + 1).cast("double") / (col("__tb") + k)) *
        (log(col("na") + 1) - log(col("__ta") + k) -
          log(col("nb") + 1) + log(col("__tb") + k)))
        .cast("decimal(18,12)")
    joined.crossJoin(tot)
      .agg(max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        round(sum(term).cast("double"), 6).as("psi"))
      .select(col("n_a"), col("n_b"), col("psi"),
        (col("psi") > threshold).as("drifted"))
  }

  /** Median/MAD (median absolute deviation) outlier gate — the
    * robust-statistics sibling of [[zscoreOutliers]] (mean/stddev melt
    * under the very outliers they hunt; median/MAD have a 50%
    * breakdown point — Hampel's rule): flag rows with
    * |v − median| > k · MAD per group. Two grouped exact-percentile
    * aggregations (median first, then the deviation median over the
    * residuals) — per-GROUP percentiles, so no single global reducer;
    * both round to `roundScale` decimals before the fence arithmetic
    * (the q102 discipline: percentile interpolation is the one exact
    * aggregate whose last ulp differs across engines).
    *
    * MAD = 0 (over half the group identical) flags any deviation > 0 —
    * the standard degenerate-Hampel behavior.
    *
    * → input rows that breach the fence, plus (med, mad)
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0, roundScale: Int = 4): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), roundScale)
        .as("med"))
    val mad = df.join(med, groupCol)
      .groupBy(col(groupCol), col("med"))
      .agg(round(expr(s"percentile(abs($valueCol - med), 0.5)"),
        roundScale).as("mad"))
    df.join(mad, groupCol)
      .filter(abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Join-key skew diagnostics — the pre-flight check before a big
    * shuffle join: per-key counts aggregated once, then a one-row
    * summary of how the shuffle will land. `skew_ratio` = heaviest key
    * over the mean key; `suggested_salts` = ceil(max_count /
    * ceil(n_rows / numPartitions)) — how many ways the hottest key's
    * rows must split so its partition is no fuller than an average one
    * (1 = no salting needed; feeds [[graft.ops.ScaleOps.saltedJoin]]).
    * All integer arithmetic plus two IEEE divisions — replayable.
    *
    * → one row: (n_rows, n_distinct, max_count, max_key,
    *   skew_ratio, suggested_salts)
    */
  def keySkew(df: DataFrame, keyCol: String,
              numPartitions: Int = 32): DataFrame = {
    require(numPartitions > 0, "numPartitions must be > 0")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
    counts.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        max(col("__n")).as("max_count"),
        // deterministic heaviest key: max (count, key) pair
        max(struct(col("__n"), col("__k"))).getField("__k").as("max_key"))
      .select(col("n_rows"), col("n_distinct"), col("max_count"),
        col("max_key"),
        (col("max_count").cast("double") * col("n_distinct").cast("double")
          / col("n_rows").cast("double")).as("skew_ratio"),
        ceil(col("max_count").cast("double") /
          ceil(col("n_rows").cast("double") / numPartitions))
          .cast("long").as("suggested_salts"))
  }

  /** Mutual information between two categorical columns (Shannon 1948;
    * the dependence measure correlation can't see — MI catches ANY
    * association, not just monotone): MI = Σ p(x,y)·ln(p(x,y)/(p(x)
    * p(y))) in nats, with both marginal entropies and the uncertainty
    * coefficient U(x|y) = MI/H(x) (Theil — the [0,1] "how much of x
    * does knowing y explain"). The feature-selection / leakage-audit
    * primitive: a near-1 coefficient between a feature and the label
    * usually means the feature IS the label.
    *
    * Every term is one ln of a ratio of exact integer products (the
    * PMI recipe) times an exact rational, cast to DECIMAL(18,12)
    * before the order-independent sums. One corpus aggregation to the
    * joint (x, y) plane; marginals, entropies and the final reduction
    * run there.
    *
    * → one row (n_items, mi, h_x, h_y, u_xy) — u_xy NULL when H(x)=0.
    */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    val joint = df
      .select(col(xCol).cast("string").as("__x"),
        col(yCol).cast("string").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared by marginals, totals and the MI terms
    val tot = joint.agg(sum(col("__n")).as("__N0"))
    val mx = joint.groupBy("__x").agg(sum(col("__n")).as("__nx"))
    val my = joint.groupBy("__y").agg(sum(col("__n")).as("__ny"))
    def entropy(marg: DataFrame, nCol: String): DataFrame =
      marg.crossJoin(broadcast(tot))
        .select(((col(nCol).cast("double") / col("__N0").cast("double")) *
          log(col(nCol).cast("double") / col("__N0").cast("double")))
          .cast("decimal(18,12)").as("__t"))
        .agg((-sum(col("__t"))).cast("string").cast("double").as("__h"))
    val mi = joint.join(mx, "__x").join(my, "__y")
      .crossJoin(broadcast(tot))
      .select(((col("__n").cast("double") / col("__N0").cast("double")) *
        log((col("__n").cast("double") * col("__N0").cast("double")) /
          (col("__nx").cast("double") * col("__ny").cast("double"))))
        .cast("decimal(18,12)").as("__t"))
      .agg(sum(col("__t")).cast("string").cast("double").as("__mi"))
    tot.crossJoin(mi)
      .crossJoin(entropy(mx, "__nx").withColumnRenamed("__h", "__hx"))
      .crossJoin(entropy(my, "__ny").withColumnRenamed("__h", "__hy"))
      .select(col("__N0").as("n_items"), col("__mi").as("mi"),
        col("__hx").as("h_x"), col("__hy").as("h_y"),
        when(col("__hx") > 0, col("__mi") / col("__hx")).as("u_xy"))
  }

  /** Benford's-law first-digit audit (Benford 1938; Nigrini's fraud-
    * detection staple): natural multi-scale magnitudes put digit d
    * first with probability log10(1+1/d); fabricated or truncated
    * numeric columns drift, and the χ² against the Benford expectation
    * trips. The data-quality gate for financial/measurement columns.
    *
    * Determinism: the first significant digit comes from the INTEGER
    * rendering of floor(|v|·100) — never from a double's string form
    * (engines disagree on scientific notation) and never from a
    * float log10 boundary. FLOOR, not round: rounding can carry a
    * value across a power of ten (9.9999 → "1000" → digit 1) or pull
    * a sub-unit value up a digit (0.0196 → "2"); truncation cannot.
    * All 9 digits are reported (absent digits count 0 — their χ² term
    * is the largest, skipping them understates the statistic). χ²
    * terms are engine-identical doubles summed through DECIMAL(28,6)
    * (order-independent; a fully concentrated 10^10-row series tops
    * 10^12 and would NULL out at 18,6); the 15.507 threshold is the
    * α=0.05, df=8 critical value.
    *
    * Scale shape: one aggregation to the 9-row digit plane; everything
    * after runs there. NULL values and magnitudes outside
    * [0.01, 9·10^16) are excluded — below, the cents rendering has no
    * significant digit; above, |v|·100 would overflow the exact BIGINT
    * rendering. Both guards are the same double comparison in any
    * engine.
    *
    * → (digit, n_obs, p_obs, p_exp, chi2, reject_benford) — 9 rows,
    *   chi2/verdict repeated on each.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    // 9-digit plane: single-partition windows by construction
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(df))
    val v = abs(col(valueCol).cast("double"))
    val cents = when(v >= 0.01 && v < 9.0e16, floor(v * 100).cast("long"))
    val counts = df.select(cents.as("__c")).filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val en = spine.join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("__tot", sum(col("n_obs")).over(all))
      .withColumn("p_obs",
        col("n_obs").cast("double") / col("__tot").cast("double"))
      .withColumn("p_exp",
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .withColumn("__e", col("p_exp") * col("__tot").cast("double"))
      .withColumn("__term",
        (((col("n_obs").cast("double") - col("__e")) *
          (col("n_obs").cast("double") - col("__e"))) / col("__e"))
          .cast("decimal(28,6)"))
    en.withColumn("chi2",
        sum(col("__term")).over(all).cast("string").cast("double"))
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        col("p_obs"), col("p_exp"), col("chi2"),
        (col("chi2") > 15.507).as("reject_benford"))
  }

  /** Cohen's kappa inter-annotator agreement (Cohen, Educ. Psychol.
    * Meas. 1960) between two categorical labelings of the same items:
    * κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement rate and
    * p_e = Σ_k (n_{a=k}·n_{b=k})/N² the chance agreement from the
    * marginals — the standard annotation-quality gate for preference /
    * SFT label audits. Items where either label is NULL are excluded
    * (unlabeled, not disagreement).
    *
    * Scale shape: everything reduces through the K×K confusion frame —
    * one aggregation over the corpus (map-side combined to ≤K² partial
    * rows per partition), then marginals, totals and the κ arithmetic
    * run on that tiny frame; output is one row. The p_e numerator rides
    * DECIMAL(38,0) (n_a·n_b sums can pass 2^63 when N does 2^31.5) and
    * exits over the VARCHAR→DOUBLE bridge; p_o, p_e and κ are then a
    * fixed sequence of IEEE divisions any engine replays bit-exactly.
    *
    * → one row (n_items, po, pe, kappa); kappa NULL when p_e = 1
    *   (a single class on both sides — agreement is vacuous).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val conf = df
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared skinny plane: scan the corpus ONCE
    val totals = conf.agg(
      sum(col("__n")).as("__N"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))), lit(0L))
        .as("__agree"))
    val peNum = conf.groupBy("__a").agg(sum("__n").as("__na"))
      .join(conf.groupBy("__b").agg(sum("__n").as("__nb")),
        col("__a") === col("__b"))
      .agg(coalesce(sum(col("__na").cast("decimal(38,0)") * col("__nb")),
        lit(0).cast("decimal(38,0)")).as("__pe_num"))
    val out = totals.crossJoin(peNum)
      .select(col("__N").as("n_items"),
        (col("__agree").cast("double") / col("__N").cast("double")).as("po"),
        (col("__pe_num").cast("string").cast("double") /
          col("__N").cast("double") / col("__N").cast("double")).as("pe"))
      .select(col("n_items"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
    out
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT (Smirnov 1939; the
    * standard distribution-shift gate between two cohorts of one
    * numeric column — "did doc length shift between crawls?" — that,
    * unlike [[psiDrift]], needs no binning choices): D = max over the
    * pooled values of |F̂_A(v) − F̂_B(v)|. Computed as an INTEGER
    * maximum — max |cumA·n_B − cumB·n_A| over distinct values, divided
    * once at the end — so the statistic is a single IEEE division of
    * exact integers and replays bit-equal in any engine; no float
    * accumulates across rows.
    *
    * Scale shape (the [[graft.ops.ScaleOps.rankBuckets]] recipe — a
    * `SUM OVER (ORDER BY v)` with no PARTITION BY would funnel every
    * distinct value through ONE task): per-value counts are ONE
    * aggregation (map-side combined); the distinct-value frame is
    * range-repartitioned so each partition owns a disjoint value range,
    * one lightweight pass ships 2·P longs to the driver (per-partition
    * subtotals → prefix offsets), and a second pass emits running
    * cumulatives per partition. The max then reduces distributed; one
    * row comes out.
    *
    * The verdict compares D against the large-sample α=0.05 critical
    * value 1.358·sqrt((n_A+n_B)/(n_A·n_B)) — the coefficient is the
    * TABULATED c(0.05) as a literal, not computed via ln (a transcendental
    * whose last ulp engines may disagree on); sqrt is IEEE
    * correctly-rounded everywhere, so the whole verdict replays exactly.
    *
    * → one row (n_a, n_b, n_values, ks_d, d_crit, reject_same_dist)
    */
  def ksTwoSample(df: DataFrame, groupCol: String, valueCol: String,
                  groupA: String, groupB: String,
                  numPartitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val counts = df
      .select(col(groupCol).cast("string").as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull &&
        (col("__g") === groupA || col("__g") === groupB))
      .groupBy("__v")
      .agg(sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__cb"))
    // eager localCheckpoint: the arranged frame feeds two rdd passes
    val arranged = counts.repartitionByRange(numPartitions, col("__v"))
      .sortWithinPartitions("__v")
      .localCheckpoint(true)
    val rdd = arranged.rdd
    val parts = rdd.mapPartitionsWithIndex((pid, it) => {
      var a = 0L; var b = 0L
      while (it.hasNext) { val r = it.next(); a += r.getLong(1); b += r.getLong(2) }
      Iterator.single((pid, a, b))
    }, preservesPartitioning = true).collect().sortBy(_._1)
    val offA = parts.map(_._2).scanLeft(0L)(_ + _)
    val offB = parts.map(_._3).scanLeft(0L)(_ + _)
    val nA = offA.last
    val nB = offB.last
    require(nA > 0 && nB > 0,
      s"ksTwoSample: both samples must be nonempty (n_a=$nA, n_b=$nB)")
    val cumSchema = StructType(Seq(
      StructField("__cumA", LongType, nullable = false),
      StructField("__cumB", LongType, nullable = false)))
    val cums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var a = offA(pid); var b = offB(pid)
      it.map { r => a += r.getLong(1); b += r.getLong(2); Row(a, b) }
    }
    val spark = df.sparkSession
    val denD = lit(nA.toDouble) * lit(nB.toDouble)
    val critC = 1.358
    spark.createDataFrame(cums, cumSchema)
      .agg(
        max(abs(col("__cumA").cast("decimal(38,0)") * nB -
          col("__cumB").cast("decimal(38,0)") * nA)).as("__dnum"),
        count(lit(1)).as("n_values"))
      .select(
        lit(nA).as("n_a"), lit(nB).as("n_b"), col("n_values"),
        (col("__dnum").cast("string").cast("double") / denD).as("ks_d"),
        (lit(critC) * sqrt(lit((nA + nB).toDouble) / denD)).as("d_crit"))
      .withColumn("reject_same_dist", col("ks_d") > col("d_crit"))
  }

  /** Winsorization (Tukey's robust-statistics clamp; Dixon & Tukey
    * 1968): values below the pLo quantile or above the pHi quantile are
    * clamped to those EXACT order-statistic bounds — the standard
    * outlier-taming transform before means/regressions on heavy-tailed
    * columns (doc lengths, prices, latencies), preferable to trimming
    * when row counts must be preserved.
    *
    * The bounds are [[graft.ops.ScaleOps.exactQuantiles]] order
    * statistics (value at 0-based rank floor(q·(n−1)) — actual data
    * values, no interpolation), so the clamp replays bit-exactly in any
    * engine. NULL values stay NULL; when the column is empty the input
    * passes through unclamped.
    *
    * Scale shape: the quantile pass is the rankBuckets range-partition
    * recipe (|qs|=2 values to the driver); the clamp itself is one
    * broadcast of a 1-row bounds frame — no shuffle of the data.
    *
    * → input columns + `<valueCol>_wins` (the clamped value).
    */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double = 0.01,
                pHi: Double = 0.99, numPartitions: Int = 32): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val qs = ScaleOps.exactQuantiles(
      df.select(col(valueCol)), valueCol, Seq(pLo, pHi), numPartitions)
    val bounds = qs.agg(
      min(when(col("q") === pLo, col("value"))).as("__lo"),
      max(when(col("q") === pHi, col("value"))).as("__hi"))
    val v = col(valueCol)
    df.crossJoin(broadcast(bounds)) // 1-row bounds frame
      .withColumn(s"${valueCol}_wins",
        when(v.isNull, lit(null))
          .otherwise(coalesce(least(greatest(v, col("__lo")), col("__hi")),
            v)))
      .drop("__lo", "__hi")
  }

  /** Fleiss' kappa multi-rater agreement (Fleiss, Psychol. Bull. 1971)
    * over a LONG (item, rating) frame — the n-rater generalization of
    * [[cohenKappa]] and the standard QA gate when ≥3 annotators label
    * the same items (RLHF preference labels, quality tiers):
    * κ = (P̄_o − P̄_e)/(1 − P̄_e) with
    * P̄_o = (Σ_i Σ_k n_ik² − N·n)/(N·n·(n−1)) and
    * P̄_e = Σ_k (Σ_i n_ik)²/(N·n)².
    *
    * Fleiss assumes a CONSTANT rater count per item; a ragged frame
    * fails loudly (the check is one aggregation over the skinny
    * per-item plane — two longs to the driver), as does n=1 (agreement
    * is undefined with one rater).
    *
    * Scale shape: everything reduces through the (item, category) count
    * plane — one corpus aggregation (map-side combined), scanned once
    * via localCheckpoint for the per-item and per-category reductions.
    * Both quadratic sums ride DECIMAL(38,0) (Σn_ik² can pass 2^63 when
    * N·n² does) and exit over the VARCHAR→DOUBLE bridge; P̄_o, P̄_e and
    * κ are then a fixed sequence of IEEE divisions any engine replays
    * bit-exactly. Output is one row.
    *
    * → one row (n_items, n_raters, n_categories, po, pe, kappa);
    *   kappa NULL when P̄_e = 1 (a single category — vacuous agreement).
    */
  def fleissKappa(df: DataFrame, itemCol: String,
                  labelCol: String): DataFrame = {
    val nik = df
      .select(col(itemCol).cast("string").as("__i"),
        col(labelCol).cast("string").as("__k"))
      .filter(col("__i").isNotNull && col("__k").isNotNull)
      .groupBy("__i", "__k").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared skinny plane: scan the corpus ONCE
    val perItem = nik.groupBy("__i").agg(
      sum(col("__n")).as("__ni"),
      sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__si"))
    // constant-rater-count contract: bounded driver check (2 longs)
    val shape = perItem.agg(min(col("__ni")).as("mn"),
      max(col("__ni")).as("mx")).head()
    // min/max over zero rows are NULL — name the empty-input contract
    // instead of NPE-ing out of getLong (r15 ADVICE)
    require(!shape.isNullAt(0),
      "fleissKappa: input has no non-NULL (item, label) rows")
    val (mn, mx) = (shape.getLong(0), shape.getLong(1))
    require(mn == mx, s"fleissKappa requires a constant rater count per " +
      s"item; found between $mn and $mx ratings — complete or drop " +
      "partially-rated items first")
    require(mn >= 2, s"fleissKappa needs >= 2 raters per item (found $mn)")
    val n = mn
    val totals = perItem.agg(count(lit(1)).as("__N"),
      sum(col("__si")).as("__S"))
    val peNum = nik.groupBy("__k").agg(sum(col("__n")).as("__ck"))
      .agg(sum(col("__ck").cast("decimal(38,0)") * col("__ck"))
        .as("__pe_num"), count(lit(1)).as("__K"))
    totals.crossJoin(peNum) // two 1-row frames
      .select(col("__N").as("n_items"), lit(n).as("n_raters"),
        col("__K").as("n_categories"),
        ((col("__S") - col("__N").cast("decimal(38,0)") * lit(n))
          .cast("string").cast("double") /
          (col("__N").cast("double") * lit(n.toDouble) *
            lit((n - 1).toDouble))).as("po"),
        (col("__pe_num").cast("string").cast("double") /
          (col("__N").cast("double") * lit(n.toDouble)) /
          (col("__N").cast("double") * lit(n.toDouble))).as("pe"))
      .select(col("n_items"), col("n_raters"), col("n_categories"),
        col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }

  /** Krippendorff's alpha for nominal data (Krippendorff 1970, 2004) —
    * the agreement coefficient that, unlike [[fleissKappa]], tolerates
    * MISSING ratings and varying rater counts per item (the real shape
    * of crowdsourced annotation): α = 1 − D_o/D_e over the coincidence
    * matrix of pairable ratings. Using the nominal closed form,
    *
    *   D_o = Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1)   (units with m_u ≥ 2)
    *   α   = 1 − (N−1)·D_o / (N² − Σ_c n_c²)
    *
    * with m_u the unit's rating count, n_uc its per-category counts,
    * N/n_c the totals over pairable units. Units with a single rating
    * are unpairable and excluded (the standard treatment of missing
    * data).
    *
    * Determinism: each unit's D_o term is ONE IEEE division of exact
    * integers routed through DECIMAL(28,12) before the order-
    * independent sum (the [[benfordAudit]] recipe); N²−Σn_c² rides
    * DECIMAL(38,0) over the VARCHAR bridge; α is then a fixed IEEE
    * sequence any engine replays bit-exactly.
    *
    * Scale shape: one corpus aggregation to the (unit, category) count
    * plane (localCheckpoint — scanned for the unit terms and the
    * category margins); output is one row.
    *
    * → one row (n_units, n_ratings, n_categories, d_o, alpha); alpha
    *   NULL when D_e = 0 (a single category — agreement is vacuous)
    *   or no unit is pairable.
    */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        labelCol: String): DataFrame = {
    val nuc = df
      .select(col(itemCol).cast("string").as("__u"),
        col(labelCol).cast("string").as("__k"))
      .filter(col("__u").isNotNull && col("__k").isNotNull)
      .groupBy("__u", "__k").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared skinny plane: scan the corpus ONCE
    val units = nuc.groupBy("__u").agg(
        sum(col("__n")).as("__m"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__sq"))
      .filter(col("__m") >= 2) // pairable units only
      .localCheckpoint() // feeds the D_o terms AND the margins filter
    val dO = units.select(
        (((col("__m").cast("decimal(38,0)") * col("__m") - col("__sq"))
          .cast("string").cast("double")) /
          (col("__m") - 1).cast("double")).cast("decimal(28,12)").as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0).cast("decimal(28,12)"))
        .cast("string").cast("double").as("__do"),
        count(lit(1)).as("__nu"))
    val margins = nuc.join(units.select("__u"), "__u") // pairable only
      .groupBy("__k").agg(sum(col("__n")).as("__nc"))
      .agg(coalesce(sum(col("__nc")), lit(0L)).as("__N"),
        coalesce(sum(col("__nc").cast("decimal(38,0)") * col("__nc")),
          lit(0).cast("decimal(38,0)")).as("__sqc"),
        count(lit(1)).as("__K"))
    dO.crossJoin(margins) // two 1-row frames
      .select(col("__nu").as("n_units"), col("__N").as("n_ratings"),
        col("__K").as("n_categories"), col("__do").as("d_o"),
        when((col("__N").cast("decimal(38,0)") * col("__N")) =!= col("__sqc"),
          lit(1.0) - ((col("__N") - 1).cast("double") * col("__do")) /
            (col("__N").cast("decimal(38,0)") * col("__N") - col("__sqc"))
              .cast("string").cast("double"))
          .as("alpha"))
  }

  /** χ² test of independence + Cramér's V (Cramér 1946) between two
    * categorical columns — the effect-size companion to
    * [[mutualInformation]] on the same question ("is language
    * independent of source?"): χ² = Σ_cells (o − e)²/e over the FULL
    * K_x×K_y grid (zero cells included — their term is e, skipping
    * them understates the statistic), V = sqrt(χ²/(N·min(K_x−1,
    * K_y−1))) ∈ [0,1].
    *
    * Determinism: each cell term is (N·o − r_x·c_y)²/(N·r_x·c_y) — a
    * single IEEE division of exact DECIMAL(38,0) integer products (the
    * [[ksTwoSample]] cross-multiplication discipline), then summed
    * order-independently through DECIMAL(28,6) (the [[benfordAudit]]
    * recipe); sqrt is IEEE correctly-rounded everywhere. No float
    * accumulates across cells.
    *
    * Scale shape: one corpus aggregation to the joint plane
    * (localCheckpoint — scanned for both marginals); the full grid is
    * the CROSS of the two marginal frames, bounded by category
    * cardinality K_x·K_y, never by corpus size. Output is one row.
    *
    * → one row (n_items, k_x, k_y, chi2, dof, cramers_v); cramers_v
    *   NULL when either side has a single category (dof = 0).
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .select(col(xCol).cast("string").as("__x"),
        col(yCol).cast("string").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // shared skinny plane: scan the corpus ONCE
    val mx = joint.groupBy("__x").agg(sum(col("__n")).as("__rx"))
    val my = joint.groupBy("__y").agg(sum(col("__n")).as("__cy"))
    val tot = joint.agg(sum(col("__n")).as("__N0"))
    // full grid: category-cardinality-bounded cross of the marginals
    val grid = mx.crossJoin(my)
      .join(joint, Seq("__x", "__y"), "left")
      .withColumn("__o", coalesce(col("__n"), lit(0L)))
      .crossJoin(broadcast(tot))
    val d38 = "decimal(38,0)"
    val diff = col("__N0").cast(d38) * col("__o") -
      col("__rx").cast(d38) * col("__cy")
    val term = ((diff * diff).cast("string").cast("double") /
      (col("__N0").cast("double") * col("__rx").cast("double") *
        col("__cy").cast("double"))).cast("decimal(28,6)")
    val chi = grid
      .agg(sum(term).cast("string").cast("double").as("chi2"),
        countDistinct(col("__x")).as("k_x"),
        countDistinct(col("__y")).as("k_y"),
        max(col("__N0")).as("n_items"))
    chi.select(col("n_items"), col("k_x"), col("k_y"), col("chi2"),
        ((col("k_x") - 1) * (col("k_y") - 1)).as("dof"),
        when(least(col("k_x"), col("k_y")) > 1,
          sqrt(col("chi2") / (col("n_items").cast("double") *
            (least(col("k_x"), col("k_y")) - 1).cast("double"))))
          .as("cramers_v"))
  }

  /** Distributed EXCLUSIVE prefix sums over a value-sorted plane (the
    * [[ksTwoSample]] two-pass recipe, factored): range-partition `plane`
    * on `valueCol`, per-partition totals to the driver (numPartitions
    * longs — the only driver traffic), then a per-partition running sum
    * seeded with the partition's offset. Each output row carries, for
    * every `sumCols` column c, `__cum_c` = the exact sum of c over all
    * STRICTLY value-preceding rows — i.e. when the plane is per-distinct-
    * value counts, the count of strictly smaller values. No global sort
    * to one task, no window over an empty partitionSpec.
    */
  private def exclusivePrefix(plane: DataFrame, valueCol: String,
                              sumCols: Seq[String],
                              numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // eager localCheckpoint: the arranged frame feeds two rdd passes
    val arranged = plane.repartitionByRange(numPartitions, col(valueCol))
      .sortWithinPartitions(valueCol)
      .localCheckpoint(true)
    val idx = sumCols.map(arranged.schema.fieldIndex).toArray
    val rdd = arranged.rdd
    val totals = rdd.mapPartitionsWithIndex((pid, it) => {
      val acc = new Array[Long](idx.length)
      while (it.hasNext) {
        val r = it.next(); var j = 0
        while (j < idx.length) { acc(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator.single((pid, acc))
    }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(new Array[Long](idx.length)) { (a, t) =>
      Array.tabulate(idx.length)(j => a(j) + t(j))
    }
    val outSchema = StructType(arranged.schema.fields ++
      sumCols.map(c => StructField(s"__cum_$c", LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = offsets(pid).clone()
      it.map { r =>
        val pre = new Array[Any](idx.length); var j = 0
        while (j < idx.length) {
          pre(j) = acc(j); acc(j) += r.getLong(idx(j)); j += 1
        }
        Row.fromSeq(r.toSeq ++ pre)
      }
    }
    plane.sparkSession.createDataFrame(out, outSchema)
  }

  /** Spearman rank correlation (Spearman 1904) between two numeric
    * columns — the monotone-association measure [[correlationMatrix]]'s
    * Pearson can't see (robust to outliers and any monotone
    * transform): Pearson's r over midranks, with tied values taking
    * the average of their covered ranks. DOUBLED midranks keep the
    * rank plane integer (the [[graft.ops.Classifier.rocAuc]] trick):
    * mr2(v) = 2·|{u < v}| + cnt(v) + 1, and scaling both variables by
    * 2 leaves the correlation unchanged — so the five moments are
    * exact DECIMAL(38,0) sums and ρ is one fixed IEEE sequence over
    * exact inputs, hash-matching any engine.
    *
    * Rows with a NULL on either side are excluded (pairwise-complete
    * convention). ρ is NULL when either column is constant.
    *
    * Scale shape: two value-counts aggregations, two [[exclusivePrefix]]
    * passes over the DISTINCT-value planes (driver traffic =
    * numPartitions longs each), two keyed joins rank the corpus, one
    * moments aggregation. No global single-task sort anywhere.
    *
    * → one row (n, spearman_rho)
    */
  def spearmanCorrelation(df: DataFrame, xCol: String, yCol: String,
                          numPartitions: Int = 32): DataFrame = {
    val pairs = df
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def midranks2(c: String, out: String): DataFrame =
      exclusivePrefix(
        pairs.groupBy(c).agg(count(lit(1)).as("__n")),
        c, Seq("__n"), numPartitions)
        .select(col(c),
          (lit(2L) * col("__cum___n") + col("__n") + lit(1L)).as(out))
    val ranked = pairs
      .join(midranks2("__x", "__rx"), "__x")
      .join(midranks2("__y", "__ry"), "__y")
    val d38 = "decimal(38,0)"
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("__rx").cast(d38)).as("__sx"),
      sum(col("__ry").cast(d38)).as("__sy"),
      sum(col("__rx").cast(d38) * col("__ry")).as("__sxy"),
      sum(col("__rx").cast(d38) * col("__rx")).as("__sxx"),
      sum(col("__ry").cast(d38) * col("__ry")).as("__syy"))
    def d(c: String) = col(c).cast("string").cast("double")
    val nD = col("n").cast("double")
    val num = nD * d("__sxy") - d("__sx") * d("__sy")
    val denx = nD * d("__sxx") - d("__sx") * d("__sx")
    val deny = nD * d("__syy") - d("__sy") * d("__sy")
    m.select(col("n"),
      when(denx > 0 && deny > 0, num / sqrt(denx * deny))
        .as("spearman_rho"))
  }

  /** Kendall rank correlation τ-b (Kendall 1938; the τ-b tie correction
    * of Kendall 1945) between two numeric columns — the
    * concordance-probability reading of monotone association
    * ([[spearmanCorrelation]]'s sibling; τ has the cleaner
    * interpretation P(concordant) − P(discordant) and more robust
    * small-sample behavior):
    *
    *   τ_b = (C − D) / √((n0 − n1)·(n0 − n2)),   n0 = n(n−1)/2
    *
    * with C/D counted on the DISTINCT (x,y)-combo plane — each
    * ordered combo pair (a, b) with x_a < x_b contributes
    * cnt_a·cnt_b to C when y_a < y_b, to D when y_a > y_b — and the
    * tie terms n1/n2 off the marginal count planes. Every count is an
    * exact DECIMAL(38,0); τ is one IEEE sequence over bridged doubles.
    * NULL pairs are excluded; τ is NULL when either column is constant.
    *
    * Scale contract: the combo self-join is QUADRATIC in distinct
    * (x,y) combos — intended for bounded planes (daily series, per-
    * group aggregates), like the oracle any engine would run. ENFORCED
    * at runtime (the max-df-probe house style, r15 verdict #6): the
    * distinct-combo count must stay ≤ `maxCombos` (default 20 000 ⇒
    * ≤ 2·10⁸ comparisons) or the call fails loudly, pointing raw-
    * corpus columns at [[spearmanCorrelation]], whose prefix-scan
    * stays linear. The probe costs one count over the already-
    * checkpointed combo plane — never a second corpus scan.
    *
    * → one row (n, concordant, discordant, tau_b)
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 maxCombos: Long = 20000L): DataFrame = {
    require(maxCombos >= 1, s"maxCombos must be positive, got $maxCombos")
    val combos = df
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds the pair join twice + three marginals
    val nCombos = combos.count()
    require(nCombos <= maxCombos,
      s"kendallTau: $nCombos distinct (x,y) combos exceed maxCombos=" +
        s"$maxCombos — the pair join is quadratic in this plane; " +
        "aggregate first, raise maxCombos deliberately, or use " +
        "spearmanCorrelation (linear prefix-scan) for raw corpus columns")
    val d38 = "decimal(38,0)"
    val a = combos.select(col("__x").as("__xa"), col("__y").as("__ya"),
      col("__c").as("__ca"))
    val b = combos.select(col("__x").as("__xb"), col("__y").as("__yb"),
      col("__c").as("__cb"))
    val cd = a.join(b, col("__xa") < col("__xb"))
      .agg(
        coalesce(sum(when(col("__ya") < col("__yb"),
          col("__ca").cast(d38) * col("__cb"))), lit(0).cast(d38))
          .as("__cc"),
        coalesce(sum(when(col("__ya") > col("__yb"),
          col("__ca").cast(d38) * col("__cb"))), lit(0).cast(d38))
          .as("__dd"))
    def tiePairs(c: String) = combos.groupBy(c)
      .agg(sum(col("__c")).as("__m"))
      .agg(coalesce(sum(col("__m").cast(d38) * (col("__m") - 1)),
        lit(0).cast(d38)).as("__t2")) // 2× the tied-pair count
    val nr = combos.agg(coalesce(sum(col("__c")), lit(0L)).as("n"))
    def d(c: String) = col(c).cast("string").cast("double")
    nr.crossJoin(cd)
      .crossJoin(tiePairs("__x").withColumnRenamed("__t2", "__tx2"))
      .crossJoin(tiePairs("__y").withColumnRenamed("__t2", "__ty2"))
      .select(col("n"),
        col("__cc").cast("string").cast("double").as("concordant"),
        col("__dd").cast("string").cast("double").as("discordant"),
        {
          val n02 = col("n").cast("double") * (col("n").cast("double") -
            lit(1.0)) // 2·n0
          val den = (n02 - d("__tx2")) * (n02 - d("__ty2"))
          when(den > 0,
            lit(2.0) * (d("__cc") - d("__dd")) / sqrt(den)).as("tau_b")
        })
  }

  /** Pettitt changepoint test (Pettitt, JRSS-C 1979) over an ordered
    * series — the nonparametric "did the level shift, and WHERE?"
    * companion to the CUSUM drift detector: for each split point t,
    *
    *   U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j)
    *       = Σ_{i≤t} (mr2_i − 1 − n)        (midrank identity; the
    *                                         within-prefix pairs cancel)
    *
    * so the whole statistic rides the SAME doubled-midrank plane as
    * [[spearmanCorrelation]] — no pair join, exact integers throughout.
    * K = max_t |U_t| (t < n), the changepoint is the smallest t
    * attaining K, and the classic approximation
    * p ≈ 2·exp(−6K²/(n³+n²)) gates significance (α=0.05).
    *
    * Scale shape: one [[exclusivePrefix]] over the value plane for
    * midranks, one keyed join, one [[exclusivePrefix]] over the order
    * column for the prefix sums, one 1-row reduction. Fully linear; no
    * single-task sort. Order values must be unique (a series index);
    * NULL order/values are excluded.
    *
    * → one row (n, k_stat, change_at, p_value, significant)
    */
  def pettittTest(df: DataFrame, orderCol: String, valueCol: String,
                  numPartitions: Int = 32): DataFrame = {
    val rows = df
      .select(col(orderCol).cast("double").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    val mr = exclusivePrefix(
      rows.groupBy("__v").agg(count(lit(1)).as("__n")),
      "__v", Seq("__n"), numPartitions)
      .select(col("__v"),
        (lit(2L) * col("__cum___n") + col("__n") + lit(1L)).as("__mr2"))
    // one action, three scalars: n (inside the per-row term), the
    // unique-order contract check, and the last split point
    val head = rows.agg(count(lit(1)), countDistinct(col("__t")),
      max(col("__t"))).head()
    val n1 = head.getLong(0)
    require(n1 >= 2, s"pettittTest needs >= 2 rows, got $n1")
    require(head.getLong(1) == n1,
      s"pettittTest: orderCol must be unique per row " +
        s"(${head.getLong(1)} distinct over $n1 rows)")
    val tMax = head.getDouble(2)
    val terms = rows.join(mr, "__v")
      .select(col("__t"), (col("__mr2") - lit(1L + n1)).as("__s"))
    // U_t = prefix sum of __s through t INCLUSIVE = exclusive-prefix + own
    val u = exclusivePrefix(terms, "__t", Seq("__s"), numPartitions)
      .select(col("__t"), (col("__cum___s") + col("__s")).as("__u"))
      .filter(col("__t") =!= tMax) // t < n splits only
    val best = u
      .select(col("__t"), abs(col("__u")).as("__k"))
      .orderBy(col("__k").desc, col("__t")).limit(1)
    val nD = n1.toDouble
    best.select(lit(n1).as("n"), col("__k").as("k_stat"),
      col("__t").as("change_at"),
      // the classic approximation is a TAIL BOUND — clamp at 1 so the
      // reported value is a p-value (small K would otherwise exceed 1)
      least(lit(1.0), lit(2.0) * exp(lit(-6.0) * col("__k").cast("double") *
        col("__k").cast("double") / lit(nD * nD * nD + nD * nD)))
        .as("p_value"))
      .withColumn("significant", col("p_value") < lit(0.05))
  }

  /** GROUPED [[pettittTest]] — one changepoint scan PER SERIES (the
    * monitoring sweep: "which event types / sources / hosts shifted,
    * and when?"). Where the global flavor rides the distributed prefix
    * scan to avoid a single-partition window, the grouped flavor has a
    * natural partition key, so it is ONE window chain partitioned by
    * the group columns: doubled midranks off a rank window, U_t as a
    * running sum, the per-group argmax as a struct-max aggregation —
    * exact integers until the one exp() readout per group.
    *
    * Scale contract: per-series length is bounded by the series
    * resolution (days × groups, the [[graft.ops.EventOps]] grouped-
    * series convention), never corpus rows — aggregate first. Order
    * values must be unique per group (enforced in-plan); groups with a
    * single row have no split point and are absent from the output.
    *
    * → (groupCols…, n, k_stat, change_at, p_value, significant)
    */
  def pettittTestGrouped(df: DataFrame, groupCols: Seq[String],
                         orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "pettittTestGrouped needs group columns — use pettittTest for one series")
    val g = groupCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(g: _*)
    val rows = df
      .select(g :+ col(orderCol).cast("double").as("__t") :+
        col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__t").isNotNull && col("__v").isNotNull)
      // unique-order contract, in-plan (the global flavor's require)
      .withColumn("__dup",
        count(lit(1)).over(Window.partitionBy((g :+ col("__t")): _*)))
      .filter(coalesce(
        assert_true(col("__dup") === 1,
          concat_ws("", lit("pettittTestGrouped: duplicate order value "),
            col("__t"), lit(" within a group — orderCol must be a series index"))),
        lit(true)))
    val u = rows
      .withColumn("__n", count(lit(1)).over(wg))
      .withColumn("__mr2",
        lit(2L) * rank().over(wg.orderBy(col("__v"))) +
          count(lit(1)).over(Window.partitionBy((g :+ col("__v")): _*)) -
          lit(1L))
      .withColumn("__u", sum(col("__mr2") - 1L - col("__n"))
        .over(wg.orderBy(col("__t"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tmax", max(col("__t")).over(wg))
      .filter(col("__t") =!= col("__tmax")) // t < n splits only
    u.groupBy(g: _*)
      .agg(max(col("__n")).as("n"),
        max(struct(abs(col("__u")).as("k"), (-col("__t")).as("__negt")))
          .as("__best"))
      .select(g ++ Seq(col("n"),
        col("__best.k").as("k_stat"),
        (-col("__best.__negt")).as("change_at")): _*)
      .withColumn("p_value", least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
        col("k_stat").cast("double") * col("k_stat").cast("double") /
        (col("n").cast("double") * col("n") * col("n") +
          col("n").cast("double") * col("n")))))
      .withColumn("significant", col("p_value") < lit(0.05))
  }

  /** Benjamini–Hochberg FDR step-up (Benjamini & Hochberg 1995) over a
    * frame of per-test p-values — the multiple-testing gate the
    * experiment plane needs once [[pettittTestGrouped]] /
    * [[rankSumTest]]-style sweeps emit one hypothesis per series: at
    * level α = alphaNum/alphaDen, discoveries are the tests ranked
    * 1..k* where k* = max{ i : p_(i) · m ≤ i · α } (cross-multiplied —
    * the comparison is p·m·alphaDen ≤ i·alphaNum, no float α), plus
    * the standard monotone adjusted p-values
    * p_adj(i) = min(1, min_{j ≥ i} m·p_(j)/j). Ties rank by
    * (p, keyCols…) so the order replays on any engine.
    *
    * Scale contract: the input is one row per HYPOTHESIS — the bounded
    * test plane (series × metrics), never corpus rows — hence the
    * single [[graft.functions.BoundedKey]]-keyed window (the house
    * bounded-global-window convention). p-values outside [0,1] raise
    * in-plan. All input columns pass through.
    *
    * → input columns + (bh_rank, p_adj, discovery)
    */
  def bhFdr(tests: DataFrame, keyCols: Seq[String], pCol: String,
            alphaNum: Long = 1L, alphaDen: Long = 20L): DataFrame = {
    require(keyCols.nonEmpty, "bhFdr needs tiebreak key columns")
    require(alphaNum > 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"alpha must be a rational in (0,1]: $alphaNum/$alphaDen")
    import org.apache.spark.sql.expressions.Window
    val bk = graft.functions.ArrayMath.boundedKey(tests)
    val wAll = Window.partitionBy(bk)
    val wRank = Window.partitionBy(bk)
      .orderBy(col(pCol) +: keyCols.map(col): _*)
    tests
      .filter(coalesce(
        assert_true(col(pCol).isNotNull && col(pCol) >= 0 && col(pCol) <= 1,
          concat_ws("", lit("bhFdr: p-value outside [0,1]: "), col(pCol))),
        lit(true)))
      .withColumn("bh_rank", row_number().over(wRank).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__pass",
        col(pCol) * col("__m") * alphaDen <= col("bh_rank") * alphaNum)
      .withColumn("__kmax",
        max(when(col("__pass"), col("bh_rank"))).over(wAll))
      .withColumn("discovery",
        col("__kmax").isNotNull && col("bh_rank") <= col("__kmax"))
      .withColumn("p_adj", least(lit(1.0),
        min(col(pCol) * col("__m") / col("bh_rank"))
          .over(Window.partitionBy(bk).orderBy(col("bh_rank").desc)
            .rowsBetween(Window.unboundedPreceding, 0))))
      .drop("__m", "__pass", "__kmax")
  }

  /** Gini concentration coefficient (Gini 1912) of a nonnegative
    * numeric column — the inequality summary behind "10% of users
    * produce 90% of events" / token-ownership concentration, and the
    * scalar companion to [[keySkew]] when sizing a shuffle:
    *
    *   G = (2·Σ_i i·x_(i) − (n+1)·Σx) / (n·Σx)
    *
    * with the rank-weighted sum computed per TIE BLOCK off the
    * [[exclusivePrefix]] plane (a block of cnt c starting after b rows
    * contributes v·(c·b + c(c+1)/2) — exact integers, no per-row rank
    * materialization). Values are cast to DECIMAL(18,6) so every
    * product is exact; G is one IEEE sequence over bridged sums.
    * Negative values are rejected (Gini is undefined); NULLs excluded;
    * G is NULL when the total is 0.
    *
    * Scale shape: one value-counts aggregation, one prefix pass, one
    * 1-row reduction — linear, no global sort.
    *
    * → one row (n, total, gini)
    */
  def giniConcentration(df: DataFrame, valueCol: String,
                        numPartitions: Int = 32): DataFrame = {
    val vals = df.select(col(valueCol).cast("double")
        .cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
    val neg = vals.filter(col("__v") < 0).limit(1).count()
    require(neg == 0, "giniConcentration: negative values are undefined")
    val plane = vals.groupBy("__v").agg(count(lit(1)).as("__n"))
    val d38 = "decimal(38,6)"
    val agg = exclusivePrefix(plane, "__v", Seq("__n"), numPartitions)
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        coalesce(sum(col("__v").cast(d38) * col("__n")), lit(0).cast(d38))
          .as("__sx"),
        // Σ over the block of v: v·(c·b + c·(c+1)/2); doubled to stay
        // integral: 2·term = v·c·(2b + c + 1) — the inner factors ride
        // DECIMAL so no long product ever overflows (c·b ~ n² at scale)
        coalesce(sum(col("__v").cast(d38) * col("__n") *
          (lit(2L) * col("__cum___n") + col("__n") + lit(1L))),
          lit(0).cast(d38)).as("__s2")) // = 2·Σ i·x_(i)
    def d(c: String) = col(c).cast("string").cast("double")
    agg.select(col("n"),
      d("__sx").as("total"),
      when(d("__sx") > 0,
        (d("__s2") - (col("n").cast("double") + lit(1.0)) * d("__sx")) /
          (col("n").cast("double") * d("__sx"))).as("gini"))
  }

  /** Benjamini–Hochberg FDR correction (Benjamini & Hochberg, JRSS-B
    * 1995) over a table of p-values — the multiple-testing gate every
    * fleet of per-group tests ([[pettittTest]] per series, per-segment
    * A/Bs) needs before acting on "significant" rows: with m tests,
    * adjusted p_(i) = min_{j≥i} p_(j)·m/j, capped at 1, and a row is
    * significant when its adjusted p ≤ α. Tied raw p-values provably
    * receive equal adjusted values (the suffix min flattens them), so
    * the output is tie-order-independent and replays in any engine:
    * each term is one IEEE p·m/k, the suffix min is order-independent.
    *
    * Scale shape: one bounded single-partition window pass — the
    * p-value table is tests, not data (documented bounded; the
    * BoundedKey constant-key discipline).
    *
    * → input columns + (p_adjusted, significant); NULL p rows are
    *   passed through untouched with NULL outputs.
    */
  def fdrCorrect(df: DataFrame, pCol: String,
                 alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val W = org.apache.spark.sql.expressions.Window
    val key = graft.functions.ArrayMath.boundedKey(df)
    val valid = col(pCol).isNotNull
    val wAll = W.partitionBy(key)
    // descending scan: k = m − rn + 1; running min over the prefix of
    // the DESC order = suffix min of the ASC order
    val wDesc = W.partitionBy(key).orderBy(col(pCol).desc_nulls_first)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val mD = sum(when(valid, 1L).otherwise(0L)).over(wAll).cast("double")
    val rnDesc = sum(when(valid, 1L).otherwise(0L)).over(wDesc)
    val term = when(valid,
      col(pCol).cast("double") * mD / (mD - rnDesc.cast("double") + 1.0))
    df.withColumn("p_adjusted", least(min(term).over(wDesc), lit(1.0)))
      .withColumn("p_adjusted", when(valid, col("p_adjusted")))
      .withColumn("significant",
        when(valid, col("p_adjusted") <= lit(alpha)))
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) per group over
    * an ordered series — "is this series monotonically trending?", the
    * significance companion to [[theilSenSlope]]'s magnitude (the
    * standard pairing in environmental/ops monitoring):
    *
    *   S = Σ_{i<j} sgn(x_j − x_i)            (by time order)
    *   Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
    *   z = (S − sgn(S)) / √Var(S)            (continuity-corrected)
    *
    * S and both variance terms are exact DECIMAL(38,0) integers; z is
    * one IEEE sequence over bridged doubles; the verdict gates |z| at
    * the α=0.05 two-sided critical value (no normal CDF — the
    * [[ksTwoSample]] critical-value convention).
    *
    * Scale contract: the within-group pair join is QUADRATIC in group
    * rows — bounded-series planes only (the [[kendallTau]] contract).
    * Order values must be unique within a group for a deterministic
    * replay (ENFORCED by a bounded one-long driver check, the
    * [[pettittTest]] convention); NULL rows excluded.
    *
    * → (groupCols…, n, s_stat, var_s, z, trend) where trend ∈
    *   {increasing, decreasing, none} at α=0.05
    */
  def mannKendallTrend(df: DataFrame, groupCols: Seq[String],
                       orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty,
      "mannKendallTrend needs at least one group column (use a literal " +
        "constant column for a global test)")
    val g = groupCols.map(col)
    val rows = df
      .select((g :+ col(orderCol).cast("double").as("__t") :+
        col(valueCol).cast("double").as("__x")): _*)
      .filter(col("__t").isNotNull && col("__x").isNotNull)
      .localCheckpoint() // feeds the pair join twice + the tie plane
    // unique-order contract enforced loudly (the [[pettittTest]]
    // discipline, per r15 ADVICE): tied order values would silently
    // drop pairs from S and make the replay labeling-dependent. The
    // same probe also enforces the bounded-series contract before the
    // quadratic pair join runs (the [[kendallTau]] maxCombos guard).
    // Bounded driver check — TWO longs off the checkpointed plane.
    val maxGroupRows = 20000L
    val dupRow = rows.groupBy(g: _*)
      .agg((count(lit(1)) - countDistinct(col("__t"))).as("__d"),
        count(lit(1)).as("__n"))
      .agg(max(col("__d")), max(col("__n"))).head()
    require(dupRow.isNullAt(0) || dupRow.getLong(0) == 0L,
      "mannKendallTrend: orderCol must be unique within each group " +
        s"(found a group with ${if (dupRow.isNullAt(0)) 0L
          else dupRow.getLong(0)} duplicated order rows)")
    require(dupRow.isNullAt(1) || dupRow.getLong(1) <= maxGroupRows,
      "mannKendallTrend: a group holds " +
        s"${if (dupRow.isNullAt(1)) 0L else dupRow.getLong(1)} rows — " +
        s"the within-group pair join is quadratic; keep groups <= " +
        s"$maxGroupRows rows (aggregate the series first)")
    val d38 = "decimal(38,0)"
    val a = rows.select((g :+ col("__t").as("__ta") :+
      col("__x").as("__xa")): _*)
    val b = rows.toDF(rows.columns.map(c =>
      if (c == "__t") "__tb" else if (c == "__x") "__xb" else c): _*)
    val s = a.join(b, groupCols)
      .filter(col("__ta") < col("__tb"))
      .groupBy(g: _*)
      .agg(coalesce(sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L).otherwise(0L)
        .cast(d38)), lit(0).cast(d38)).as("__s"))
    val ties = rows.groupBy((g :+ col("__x")): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(g: _*)
      .agg(coalesce(sum(col("__c").cast(d38) * (col("__c") - 1) *
        (lit(2L) * col("__c") + lit(5L))), lit(0).cast(d38)).as("__tt"),
        sum(col("__c")).as("n"))
    def d(c: String) = col(c).cast("string").cast("double")
    val nD = col("n").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      d("__tt")) / lit(18.0)
    val sD = d("__s")
    val z = when(col("__s") > 0, (sD - lit(1.0)) / sqrt(varS))
      .when(col("__s") < 0, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    // anchor on the tie plane: a single-row group has no pairs at all
    // (S = 0 by convention), and the pair join would silently drop it
    ties.join(s, groupCols.toSeq, "left")
      .withColumn("__s", coalesce(col("__s"), lit(0).cast(d38)))
      .select((g :+ col("n") :+ sD.as("s_stat") :+ varS.as("var_s") :+
        when(varS > 0, z).as("z")): _*)
      .withColumn("trend",
        when(col("z").isNull, lit("none"))
          .when(col("z") > lit(1.959963984540054), lit("increasing"))
          .when(col("z") < lit(-1.959963984540054), lit("decreasing"))
          .otherwise(lit("none")))
  }

  /** Theil–Sen robust slope (Theil 1950; Sen, JASA 1968) of y on x —
    * the median of all pairwise slopes, with up to ~29% breakdown
    * (outlier days can't drag it the way [[graft.ops.EventOps
    * .dailyTrend]]'s OLS slope is dragged), plus the standard
    * median-residual intercept. Determinism: each pairwise slope is
    * one engine-identical IEEE division; the median is an EXACT order
    * statistic — rank ⌈m/2⌉ on (slope, xa, xb) — no interpolation, so
    * the chosen value replays bit-for-bit.
    *
    * Scale contract: the pair join is QUADRATIC in rows — intended
    * for bounded planes (daily/series aggregates), the same contract
    * as [[kendallTau]], and like it ENFORCED at runtime: the point
    * count must stay ≤ `maxRows` (default 20 000) or the call fails
    * loudly before the pair join ever runs (the probe counts the
    * already-checkpointed point plane). x-ties contribute no slope
    * (vertical pairs are skipped, the standard convention); NULL
    * pairs excluded.
    *
    * → one row (n_points, n_pairs, slope, intercept); NULLs when no
    *   non-vertical pair exists.
    */
  def theilSenSlope(df: DataFrame, xCol: String, yCol: String,
                    maxRows: Long = 20000L): DataFrame = {
    require(maxRows >= 1, s"maxRows must be positive, got $maxRows")
    val pts = df
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint() // feeds the pair join twice + the residual pass
    val nPts = pts.count()
    require(nPts <= maxRows,
      s"theilSenSlope: $nPts points exceed maxRows=$maxRows — the " +
        "pairwise-slope join is quadratic; aggregate to a bounded " +
        "series first (e.g. daily means) or raise maxRows deliberately")
    val a = pts.select(col("__x").as("__xa"), col("__y").as("__ya"))
    val b = pts.select(col("__x").as("__xb"), col("__y").as("__yb"))
    val slopes = a.join(b, col("__xa") < col("__xb"))
      .select(col("__xa"), col("__xb"),
        ((col("__yb") - col("__ya")) / (col("__xb") - col("__xa")))
          .as("__m"))
    val nPairs = slopes.count()
    if (nPairs == 0) {
      pts.sparkSession.range(1).select(
        lit(nPts).as("n_points"), lit(0L).as("n_pairs"),
        lit(null).cast("double").as("slope"),
        lit(null).cast("double").as("intercept"))
    } else {
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.ArrayMath.boundedKey(slopes))
        .orderBy(col("__m"), col("__xa"), col("__xb"))
      // bounded: the pair plane of a bounded series (documented contract)
      val med = slopes.withColumn("__rk", row_number().over(wS))
        .filter(col("__rk") === (nPairs + 1) / 2)
        .select(col("__m").as("slope"))
      val resid = pts.crossJoin(med)
        .select(col("slope"), (col("__y") - col("slope") * col("__x"))
          .as("__r"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.ArrayMath.boundedKey(resid))
        .orderBy(col("__r"))
      resid.withColumn("__rk", row_number().over(wR))
        .filter(col("__rk") === (nPts + 1) / 2)
        .select(lit(nPts).as("n_points"), lit(nPairs).as("n_pairs"),
          col("slope"), col("__r").as("intercept"))
    }
  }

  /** Wilcoxon–Mann–Whitney rank-sum test (Mann & Whitney 1947) between
    * two groups of a numeric column — the nonparametric A/B readout
    * next to [[ksTwoSample]] (KS asks "same distribution?", rank-sum
    * asks the sharper "is one group stochastically larger?") and the
    * test behind [[graft.ops.Classifier.rocAuc]]'s statistic. Doubled
    * midranks keep the rank sum integer:
    *
    *   2U_a = Σ_v na_v·(2·before_v + n_v + 1) − n_a·(n_a+1)
    *
    * with the tie-corrected normal approximation
    *   Var(U) = (n_a·n_b/12)·[(n+1) − Σ(t³−t)/(n·(n−1))],
    *   z = (2U_a − n_a·n_b) / (2·√Var(U)).
    *
    * Every sum is an exact DECIMAL(38,0); z and the common-language
    * effect size U/(n_a·n_b) (= P(a>b) + ½P(a=b), exactly ROC AUC of
    * group membership) are fixed IEEE sequences over exact inputs.
    * NULL values are excluded; both groups must be nonempty; z is NULL
    * when every value is tied (Var = 0).
    *
    * Scale shape: one aggregation to the distinct-value plane, one
    * [[exclusivePrefix]] pass, one 1-row reduction — the corpus is
    * scanned once.
    *
    * → one row (n_a, n_b, u_a, effect_size, z, reject_null at α=0.05)
    */
  def rankSumTest(df: DataFrame, groupCol: String, valueCol: String,
                  groupA: String, groupB: String,
                  numPartitions: Int = 32): DataFrame = {
    val counts = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull &&
        (col("__g") === groupA || col("__g") === groupB))
      .groupBy("__v")
      .agg(sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__nb"))
    val d38 = "decimal(38,0)"
    val cum = exclusivePrefix(counts, "__v", Seq("__na", "__nb"),
      numPartitions)
      .withColumn("__before", col("__cum___na") + col("__cum___nb"))
      .withColumn("__nv", col("__na") + col("__nb"))
    val agg = cum.agg(
      coalesce(sum(col("__na")), lit(0L)).as("n_a"),
      coalesce(sum(col("__nb")), lit(0L)).as("n_b"),
      coalesce(sum(col("__na").cast(d38) *
        (lit(2L) * col("__before") + col("__nv") + lit(1L))),
        lit(0).cast(d38)).as("__r2a"),
      coalesce(sum(col("__nv").cast(d38) * col("__nv") * col("__nv") -
        col("__nv")), lit(0).cast(d38)).as("__ties"))
    def d(c: String) = col(c).cast("string").cast("double")
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = naD + nbD
    // 2U_a as exact decimal, then one bridge to double
    val u2 = (col("__r2a") -
      col("n_a").cast(d38) * (col("n_a") + lit(1L))).cast("string")
      .cast("double")
    val varU = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - d("__ties") / (nD * (nD - lit(1.0))))
    val z = (u2 - naD * nbD) / (lit(2.0) * sqrt(varU))
    agg.select(col("n_a"), col("n_b"),
        (u2 / lit(2.0)).as("u_a"),
        when(col("n_a") > 0 && col("n_b") > 0, u2 / (lit(2.0) * naD * nbD))
          .as("effect_size"),
        when(col("n_a") > 0 && col("n_b") > 0 && varU > 0, z).as("z"))
      .withColumn("reject_null", when(col("z").isNotNull,
        abs(col("z")) > lit(1.959963984540054)))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the privacy gate a training-data release runs over its
    * metadata columns before shipping: group rows into equivalence
    * classes on the quasi-identifier columns and report whether every
    * class holds ≥ k rows (k-anonymity) and, when a sensitive column is
    * named, ≥ l distinct sensitive values (l-diversity). NULL
    * quasi-identifier values form their own class (NULL is itself a
    * quasi-identifier); rows with a NULL sensitive value count toward
    * class size but not toward its diversity.
    *
    * Everything is exact integer counting — one aggregation to the
    * equivalence-class plane (map-side combined; the class plane is
    * bounded by the quasi-identifier domain product, the whole premise
    * of the audit), one rollup to a single report row. Replays exactly
    * in any engine.
    *
    * → one row: (n_rows, n_classes, min_class_size, n_rows_below_k,
    *   k_anonymous, min_l, n_rows_below_l, l_diverse) — the l_* columns
    *   NULL when no sensitive column is given.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long,
                       sensitiveCol: Option[String] = None,
                       l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sensitiveCol.map(s => countDistinct(col(s)).as("__l"))
          .getOrElse(lit(null).cast("long").as("__l")))
    classes.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__n")).as("min_class_size"),
      coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L))
        .as("n_rows_below_k"),
      (min(col("__n")) >= k).as("k_anonymous"),
      sensitiveCol.map(_ => min(col("__l")))
        .getOrElse(lit(null).cast("long")).as("min_l"),
      sensitiveCol.map(_ =>
        coalesce(sum(when(col("__l") < l, col("__n"))), lit(0L)))
        .getOrElse(lit(null).cast("long")).as("n_rows_below_l"),
      sensitiveCol.map(_ => min(col("__l")) >= l)
        .getOrElse(lit(null).cast("boolean")).as("l_diverse"))
  }

  /** Dawid–Skene annotator-label aggregation, hard-EM flavor (Dawid &
    * Skene, JRSS-C 1979; the label-quality step every RLHF /
    * classifier-training pipeline runs after [[fleissKappa]] says the
    * raters disagree): infer each item's latent true label by
    * iterating { estimate per-annotator confusion matrices from the
    * current assignments; re-assign each item to the class maximizing
    * the add-one-smoothed log-likelihood }. Hard (Viterbi-style) EM —
    * the [[graft.ops.Unigram]] trainer's discipline — keeps EVERY
    * statistic an exact integer: confusion counts c(j,k,l), their
    * row totals n(j,k), class priors n(k), so each score
    *
    *   score(i,k) = ln(n(k)+1) − ln(N+K)
    *              + Σ_{(j,l)∈i} [ ln(c(j,k,l)+1) − ln(n(j,k)+K) ]
    *
    * is a sum of ln-of-exact-integer terms routed through
    * DECIMAL(18,12) (the q106/q109 recipe) — bit-replayable, with ties
    * broken toward the smaller class label. Initialization is majority
    * vote (ties likewise). K = the observed label alphabet.
    *
    * Scale shape per round: ONE join of the annotation table with the
    * current N-row assignment plane, aggregated to the (J·K·L)-bounded
    * confusion plane (broadcast), then annotations × K score rows
    * aggregated back to (item, class) — 2 shuffles a round, `rounds`
    * fixed and small (the paper's EM converges in a handful), no
    * driver-side data.
    *
    * → one row per item: (itemCol, label_mv — the majority-vote init —
    *   label_ds, n_annotations).
    */
  def dawidSkene(ann: DataFrame, itemCol: String, annotatorCol: String,
                 labelCol: String, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    val a = ann.select(col(itemCol).as("__i"),
        col(annotatorCol).cast("string").as("__j"),
        col(labelCol).cast("string").as("__l"))
      .filter(col("__i").isNotNull && col("__j").isNotNull &&
        col("__l").isNotNull)
      .localCheckpoint() // scanned 2× per round: pin the skinny plane
    val classes = a.select(col("__l").as("__k")).distinct()
    val globals = classes.agg(count(lit(1)).as("__kn")).crossJoin(
      a.select(col("__i")).distinct().agg(count(lit(1)).as("__n"))) // 1 row
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i")).orderBy(col("__rank"))
    val mv = a.groupBy(col("__i"), col("__l")).agg(count(lit(1)).as("__c"))
      .withColumn("__rank", struct((-col("__c")).as("a"), col("__l").as("b")))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("__i"), col("__l").as("__k"))
    def lnRatio(num: Column, den: Column): Column =
      (log(num.cast("double")) - log(den.cast("double")))
        .cast("decimal(18,12)")
    val fin = (1 to rounds).foldLeft(mv) { (assign, _) =>
      val conf = a.join(assign, Seq("__i"))
        .groupBy(col("__j"), col("__k"), col("__l"))
        .agg(count(lit(1)).as("__c"))
      val njk = conf.groupBy(col("__j"), col("__k"))
        .agg(sum(col("__c")).as("__njk"))
      val prior = assign.groupBy(col("__k")).agg(count(lit(1)).as("__nk"))
      a.crossJoin(broadcast(classes))
        .join(broadcast(conf), Seq("__j", "__k", "__l"), "left")
        .join(broadcast(njk), Seq("__j", "__k"), "left")
        .crossJoin(broadcast(globals))
        .groupBy(col("__i"), col("__k"))
        .agg(sum(lnRatio(coalesce(col("__c"), lit(0L)) + 1L,
          coalesce(col("__njk"), lit(0L)) + col("__kn"))).as("__s"))
        .join(broadcast(prior), Seq("__k"), "left")
        .crossJoin(broadcast(globals))
        .withColumn("__score", col("__s") +
          lnRatio(coalesce(col("__nk"), lit(0L)) + 1L, col("__n") + col("__kn")))
        .withColumn("__rank",
          struct((-col("__score")).as("a"), col("__k").as("b")))
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("__i"), col("__k"))
    }
    val nAnn = a.groupBy(col("__i")).agg(count(lit(1)).as("n_annotations"))
    mv.select(col("__i"), col("__k").as("label_mv"))
      .join(fin.select(col("__i"), col("__k").as("label_ds")), Seq("__i"))
      .join(nAnn, Seq("__i"))
      .select(col("__i").as(itemCol), col("label_mv"), col("label_ds"),
        col("n_annotations"))
  }
}
