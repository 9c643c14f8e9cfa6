package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, mergeable distinct-count sketching — the KMV
  * (k-minimum-values) estimator (Bar-Yossef et al. RANDOM'02; Beyer et
  * al. SIGMOD'07): keep the k smallest hash values of the distinct
  * items; with h_(k) the k-th smallest hash mapped into (0, 1), the
  * estimate is (k−1)/h_(k).
  *
  * Why this next to Spark's HLL++ (`approx_count_distinct`, used by
  * [[Profile]]'s 100 TB path): KMV is DETERMINISTIC BY CONSTRUCTION
  * (md5, no seed, no implementation-defined register layout), so the
  * sketch — not just the estimate — replays bit-for-bit in any engine
  * with md5, which is what makes a cross-engine data contract or an
  * oracle check possible at all. Sketches merge exactly: the sketch of
  * a union is the k smallest of the sketches' union, so per-partition /
  * per-day sketches roll up without rescanning.
  *
  * Hash = first 12 hex chars of md5 as a 48-bit integer — shared
  * SQL-dialect spelling (`conv` here, strpos arithmetic in DuckDB),
  * uniform on (0, 2^48).
  */
object Sketches {

  private val HashSpace = 281474976710656.0 // 2^48

  private def h48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** The sketch itself: per group, the k smallest distinct-value hashes
    * with their ranks — ≤ k skinny rows per group, exactly mergeable
    * (union two sketches, re-rank, keep rank ≤ k = the sketch of the
    * union). Ties on the 48-bit hash break by the value's string
    * rendering, so the sketch is layout-invariant.
    *
    * → (groupCols…, rank, h)
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val d = df
      .select((groupCols.map(col) :+ col(valueCol)): _*)
      .filter(col(valueCol).isNotNull)
      .distinct()
      .select(groupCols.map(col) :+ h48(col(valueCol)).as("h") :+
        col(valueCol).cast("string").as("__v"): _*)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("__v"))
    d.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(groupCols.map(col) :+ col("rank") :+ col("h"): _*)
  }

  /** Distinct-count estimate per group off a [[kmvSketch]]: when the
    * group holds fewer than k distinct values the sketch IS the
    * distinct set (estimate exact); otherwise (k−1)·2^48 / h_(k).
    *
    * → (groupCols…, n_sketch, estimate)
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"),
        max(when(col("rank") === k, col("h"))).as("__kth"))
      .select(groupCols.map(col) :+ col("n_sketch") :+
        when(col("n_sketch") < k || col("__kth") <= 0,
            col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            col("__kth").cast("double")).as("estimate"): _*)

  /** One-call convenience: sketch then estimate. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k), groupCols, k)

  /** Pairwise Jaccard similarity between every two groups' value sets,
    * estimated FROM THE SKETCHES ALONE (Beyer et al. SIGMOD'07 set-op
    * estimators): for a pair (a, b), take the k smallest hashes of the
    * UNION of the two sketches (which is exactly the union's KMV sketch
    * — mergeability) and count how many lie in BOTH sketches:
    * J ≈ n_both / n_union_sketch. When both sets are smaller than k the
    * sketches are the sets and the estimate is EXACT.
    *
    * This is the overlap/join-cardinality planning primitive: per-day or
    * per-source sketches roll up once, and any pair's overlap is
    * answered from ≤2k rows per pair — the corpus is never rescanned.
    *
    * Scale shape: groups plane × sketch rows — |G|²·k at worst, all
    * skinny (group, group, hash) rows; the group list broadcasts.
    *
    * @param sketch a [[kmvSketch]] with a single group column
    * @return (g_a, g_b, n_union_sketch, n_both, j_est) for g_a < g_b
    */
  def kmvJaccardPairs(sketch: DataFrame, groupCol: String,
                      k: Int): DataFrame = {
    val s = sketch.select(col(groupCol).cast("string").as("__g"), col("h"))
    val groups = s.select(col("__g")).distinct()
    val gp = broadcast(groups.select(col("__g").as("g_a")))
      .crossJoin(broadcast(groups.select(col("__g").as("g_b"))))
      .filter(col("g_a") < col("g_b"))
    val expanded = gp.join(s, col("__g") === col("g_a")).drop("__g")
      .withColumn("__side", lit("a"))
      .union(gp.join(s, col("__g") === col("g_b")).drop("__g")
        .withColumn("__side", lit("b")))
    val perHash = expanded.groupBy("g_a", "g_b", "h")
      .agg(countDistinct("__side").as("__sides"))
    val w = Window.partitionBy("g_a", "g_b").orderBy("h")
    perHash.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("n_union_sketch"),
        sum(when(col("__sides") === 2, 1L).otherwise(0L)).as("n_both"))
      .withColumn("j_est",
        col("n_both").cast("double") / col("n_union_sketch").cast("double"))
  }

  // --- count-min sketch ----------------------------------------------------

  /** Per-(row, key) 48-bit bucket: the CMS hash family is the [[h48]]
    * md5 recipe salted with the row index — deterministic, seedless,
    * replayable in any engine with md5.
    */
  private def cmsBucket(row: org.apache.spark.sql.Column,
                        key: org.apache.spark.sql.Column, width: Int) =
    h48(concat(row.cast("string"), lit(":"), key)) % width

  /** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    * a `depth`×`width` counter matrix — counter(i, b) = number of key
    * OCCURRENCES hashing to bucket b under row i's hash. Point queries
    * read min_i counter(i, h_i(key)): never an underestimate, over by
    * at most εN (ε = e/width) with probability 1−e^−depth.
    *
    * Scale shape: the sketch is the whole point — the frame is at most
    * depth·width rows (a few thousand) REGARDLESS of corpus size, built
    * by one depth-way explode + one aggregation whose map-side combine
    * collapses every partition to ≤ depth·width partial rows before the
    * shuffle. Per-partition sketches merge by summing counters
    * (mergeability is why CMS works as a distributed/streaming
    * frequency summary at all).
    *
    * → (row, bucket, cnt)
    */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int,
                width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("__k"))
      .select(col("row"), cmsBucket(col("row"), col("__k"), width).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  // --- HDR (base-2 geometric) quantile sketch ------------------------------
  //
  // Bucket id of a positive integer value: binary exponent (octave)
  // e = floor(log2 v) — computed EXACTLY as length(bin(v)) − 1, never via
  // a transcendental ln whose last ulp engines can disagree on — plus one
  // of m linear sub-buckets within the octave:
  //
  //   base   = 2^e
  //   sub    = ((v − base) · m) div base
  //   bucket = e·m + sub
  //
  // Monotone in v, exact integer arithmetic end to end, replayable in any
  // engine with bin/shifts (DuckDB included).

  /** Deterministic, exactly-mergeable quantile sketch — the
    * HDR-histogram / DDSketch family (Masson, Rim & Lee, VLDB 2019
    * "DDSketch"; Tene's HdrHistogram), chosen over KLL/GK deliberately:
    * KLL's randomized and GK's order-dependent compactions make
    * merge-tree == direct-build only approximately true, which breaks
    * this repo's oracle discipline. Geometric bucketing is a pure
    * function of the VALUE, so the sketch of a union is exactly the
    * bucket-wise SUM of the sketches (bit-exact, the [[AggState]]
    * property), and the whole pipeline replays hash-identically in
    * DuckDB. The trade: the guarantee is RELATIVE VALUE ERROR ≤ 1/m
    * (+1 ulp of the integer grid) instead of KLL's ε·n rank error —
    * the right bound for long-tailed length/latency distributions,
    * where a rank-ε answer can still be numerically wild.
    *
    * Scale shape: ONE aggregation over the corpus with map-side
    * combine; the state is ≤ 63·m skinny (group, bucket, cnt) rows per
    * group REGARDLESS of corpus size. Per-day / per-partition sketches
    * roll up with [[hdrMerge]] without rescanning history.
    *
    * Contract: values are POSITIVE integers < 2^56 (so `(v−base)·m`
    * never overflows a long for m ≤ 128); rows with NULL or v < 1 are
    * excluded, like the SQL aggregate convention.
    *
    * → (groupCols…, bucket, cnt)
    */
  def hdrSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                m: Int): DataFrame =
    hdrBucketize(df, groupCols, valueCol, m)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** [[hdrSketch]] over PRE-AGGREGATED input — one row per (value,
    * weight) with `cnt` = the weight SUM per bucket. At 100 TB the
    * corpus is often already rolled up (value histograms, per-key
    * counts); exploding it back to rows just to sketch would undo the
    * aggregation. Weights must be POSITIVE integers (a count); NULL or
    * < 1 weights raise in-plan — silently dropping mass would corrupt
    * every quantile read. Bit-equal to [[hdrSketch]] over the exploded
    * rows (asserted in SketchesSpec); merges/quantiles are the same
    * functions — `cnt` is weight mass either way.
    *
    * → (groupCols…, bucket, cnt)
    */
  def hdrSketchWeighted(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, weightCol: String,
                        m: Int): DataFrame =
    hdrBucketize(
      df.filter(coalesce(
        assert_true(col(weightCol).isNotNull &&
            col(weightCol).cast("long") >= 1L &&
            // integrality: a fractional weight (2.7) would otherwise
            // pass the >= 1 gate and be silently TRUNCATED to 2 by the
            // cast — dropping mass, which this operator must never do
            col(weightCol) === col(weightCol).cast("long"),
          concat_ws("", lit("hdrSketchWeighted: weight must be a"),
            lit(" positive integer count, got "), col(weightCol))),
        lit(true)))
        .withColumn("__w", col(weightCol).cast("long")),
      groupCols :+ "__w", valueCol, m)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(coalesce(sum(col("__w")).cast("bigint"), lit(0L)).as("cnt"))

  /** The PER-ROW half of [[hdrSketch]]: each surviving row mapped to its
    * bucket id, no aggregation — a pure projection, so it also runs on a
    * STREAMING DataFrame. Streaming sketch maintenance composes from
    * parts that already exist: `aggStateSink(hdrBucketize(stream, …),
    * keyCols = group :+ "bucket", …)` folds micro-batches into persisted
    * bucket counts (the state's `n`), and counts ADD — so the fold
    * equals a direct [[hdrSketch]] build over the full history
    * (asserted in StreamingAggSpec) and [[hdrQuantile]] serves straight
    * off the stored state.
    *
    * → (groupCols…, bucket) — one row per accepted input row.
    */
  def hdrBucketize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   m: Int): DataFrame = {
    require(m >= 2 && m <= 128, s"m must be in [2,128], got $m")
    df.select(groupCols.map(col) :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__v") >= 1L &&
        col("__v") < (1L << 56))
      .withColumn("__e", (length(bin(col("__v"))) - 1).cast("long"))
      .withColumn("__base", expr("shiftleft(1L, cast(__e as int))"))
      .withColumn("bucket",
        col("__e") * m + expr(s"((__v - __base) * $m) div __base"))
      .select(groupCols.map(col) :+ col("bucket"): _*)
  }

  /** Merge any number of [[hdrSketch]] states (stored + increments):
    * bucket counts ADD — associative, commutative, and BIT-EXACT, so a
    * tree of merges equals one direct build over the union (asserted
    * in SketchesSpec). One shuffle of the skinny state union.
    */
  def hdrMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hdrMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"))
  }

  /** Type-1 (lower) quantile read off a sketch: the smallest bucket
    * whose cumulative count reaches q·n — the threshold as a
    * CROSS-MULTIPLIED integer comparison (cum·den ≥ n·num for
    * q = num/den, the [[ScaleOps.weightedQuantile]] convention, so no
    * float boundary can flip a verdict) — reported as the bucket's
    * canonical lower-bound value
    *
    *   est = base + (sub·base) div m,   e = bucket div m, sub = bucket mod m
    *
    * Because bucketing is monotone, the TRUE rank-⌈q·n⌉ value x lies in
    * the selected bucket: est ≤ x ≤ est + base/m + 1, i.e. relative
    * value error ≤ 1/m + 1/base. All arithmetic on the ≤ 63·m-row
    * bucket plane — the corpus is never re-read.
    *
    * Empty `groupCols` = one global quantile (the bucket plane is
    * bounded by construction, hence the [[graft.functions.BoundedKey]]
    * partition key on the cumsum window).
    *
    * → (groupCols…, n_total, hdr_value)
    */
  def hdrQuantile(sketch: DataFrame, groupCols: Seq[String], m: Int,
                  qNum: Long = 1L, qDen: Long = 2L): DataFrame = {
    require(m >= 2 && m <= 128, s"m must be in [2,128], got $m")
    require(qNum >= 0 && qDen > 0 && qNum <= qDen,
      s"quantile must be a rational in [0,1]: $qNum/$qDen")
    val parts =
      if (groupCols.nonEmpty) groupCols.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(sketch))
    val wRun = Window.partitionBy(parts: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(parts: _*)
    sketch
      .withColumn("__cum", sum(col("cnt")).over(wRun))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .filter(col("__cum") * qDen >= col("__n") * qNum)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("bucket")).as("__b"), max(col("__n")).as("n_total"))
      .withColumn("__base", expr(s"shiftleft(1L, cast(__b div $m as int))"))
      .withColumn("hdr_value",
        col("__base") + expr(s"((__b % $m) * __base) div $m"))
      .select(groupCols.map(col) :+ col("n_total") :+ col("hdr_value"): _*)
  }

  // ------------------------------------------------------------------
  // Affine adapter onto the HDR integer grid — signed / fractional
  // values. hdrSketch contracts to POSITIVE integers; real pipeline
  // columns that aren't (day-over-day deltas, log-ratios, scores in
  // [-1,1]) map onto the grid with a caller-declared affine transform
  //
  //   grid(v)    = floor(v · scale)            (resolution 1/scale)
  //   shifted(v) = grid(v) − offsetGrid + 1    (≥ 1 by contract)
  //
  // recorded IN the sketch as meta columns, because two sketches are
  // only the same sketch when their transforms match: base-2 geometric
  // buckets of (v − offset) do NOT map onto buckets of (v − offset′),
  // so [[hdrMergeSigned]] refuses a meta mismatch loudly instead of
  // producing a silently wrong histogram. The transform must therefore
  // be DECLARED (a domain bound the caller owns — "deltas exceed
  // −10^6 · never", "scores live in [-1,1] at 10^-6 grain"), never
  // derived per batch from the data.
  //
  // floor(v·scale) on a float64 column is bit-deterministic across
  // engines (IEEE-754 multiply + floor), so the oracle discipline and
  // the exact-merge property both survive the adapter.

  /** [[hdrSketch]] for signed/fractional values via the affine map
    * above. `scale` ≥ 1 sets the grid resolution (1 for integer-valued
    * columns); `offsetGrid` is an inclusive lower bound ON THE GRID
    * (floor(v·scale) ≥ offsetGrid for every v — violations raise
    * in-plan via the assert_true house pattern rather than silently
    * vanishing from the quantiles). Meta travels with the state.
    *
    * → (groupCols…, bucket, cnt, hdr_scale, hdr_offset_grid)
    */
  def hdrSketchSigned(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, m: Int, scale: Long,
                      offsetGrid: Long): DataFrame = {
    require(m >= 2 && m <= 128, s"m must be in [2,128], got $m")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val shifted = df
      // NaN floors to NaN and CASTS TO 0 silently — it would grid as the
      // value offsetGrid/scale instead of failing; raise like the
      // below-bound case (NULLs stay excluded, the SQL convention)
      .filter(coalesce(
        assert_true(!isnan(col(valueCol).cast("double")),
          lit("hdrSketchSigned: NaN value — not mappable to the grid")),
        lit(true)))
      .select(groupCols.map(col) :+
        (floor(col(valueCol) * lit(scale)).cast("long") - offsetGrid + 1L)
          .as("__v"): _*)
      .filter(col("__v").isNotNull)
      // in-plan contract check (ScaleOps.mergeWinners pattern): a value
      // below the declared bound means the DECLARATION is wrong — fail
      // the job, don't drop the row
      .filter(coalesce(
        assert_true(col("__v") >= 1L && col("__v") < (1L << 56),
          concat_ws("", lit("hdrSketchSigned: floor(v*"), lit(scale),
            lit(") out of [offsetGrid, offsetGrid+2^56) — shifted grid value "),
            col("__v"), lit(" with offsetGrid "), lit(offsetGrid))),
        lit(true)))
    shifted
      .withColumn("__e", (length(bin(col("__v"))) - 1).cast("long"))
      .withColumn("__base", expr("shiftleft(1L, cast(__e as int))"))
      .withColumn("bucket",
        col("__e") * m + expr(s"((__v - __base) * $m) div __base"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hdr_scale", lit(scale))
      .withColumn("hdr_offset_grid", lit(offsetGrid))
  }

  /** Merge [[hdrSketchSigned]] states: bucket counts ADD (bit-exact,
    * associative — merge-tree == direct build, asserted in
    * SketchesSpec) AFTER a loud identical-meta gate: a bounded probe
    * (≤ 2 rows collected, never the corpus) refuses to merge sketches
    * built with different transforms.
    */
  def hdrMergeSigned(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hdrMergeSigned needs at least one sketch")
    val all = sketches.reduce(_ unionByName _)
    val metas = all.select(col("hdr_scale"), col("hdr_offset_grid"))
      .distinct().take(2)
    require(metas.length == 1,
      "hdrMergeSigned: sketches carry different affine meta " +
        metas.map(r => s"(scale=${r.getLong(0)}, offsetGrid=${r.getLong(1)})")
          .mkString(", ") +
        " — base-2 buckets of (v-offset) do not map onto buckets of " +
        "(v-offset'); rebuild with one declared transform")
    all.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"),
        first(col("hdr_scale")).as("hdr_scale"),
        first(col("hdr_offset_grid")).as("hdr_offset_grid"))
  }

  /** Quantile read-back through the inverse affine map. The grid value
    * is [[hdrQuantile]]'s canonical lower bound; the original-domain
    * answer is the EXACT RATIONAL (value_num / value_den):
    *
    *   value_num = hdr_value − 1 + offsetGrid,   value_den = scale
    *
    * reported as the integer pair (house cross-multiplication style —
    * no engine-specific decimal division can flip a digit). Callers
    * wanting a float divide once at the edge.
    *
    * → (groupCols…, n_total, value_num, value_den)
    */
  def hdrQuantileSigned(sketch: DataFrame, groupCols: Seq[String], m: Int,
                        qNum: Long = 1L, qDen: Long = 2L): DataFrame = {
    val base = hdrQuantile(
      sketch.select((groupCols.map(col) :+ col("bucket") :+ col("cnt")): _*),
      groupCols, m, qNum, qDen)
    // the same loud gate as hdrMergeSigned: a hand-unioned mixed-meta
    // frame would otherwise cross-multiply into silently wrong rows
    val metas = sketch.select(col("hdr_scale"), col("hdr_offset_grid"))
      .distinct().take(2)
    require(metas.length <= 1,
      "hdrQuantileSigned: sketch carries mixed affine meta " +
        metas.map(r => s"(scale=${r.getLong(0)}, offsetGrid=${r.getLong(1)})")
          .mkString(", ") + " — merge through hdrMergeSigned first")
    val meta = broadcast(
      sketch.select(col("hdr_scale"), col("hdr_offset_grid")).distinct())
    base.crossJoin(meta) // 1-row meta frame, gated above
      .withColumn("value_num",
        col("hdr_value") - 1L + col("hdr_offset_grid"))
      .select(groupCols.map(col) ++ Seq(col("n_total"),
        col("value_num"), col("hdr_scale").as("value_den")): _*)
  }

  /** Two-sample Kolmogorov–Smirnov drift gate over two [[hdrSketch]] /
    * [[hdrSketchSigned]] states — distribution comparison WITHOUT
    * re-scanning either corpus (the reason to keep mergeable sketches
    * at all: yesterday's sketch vs today's, corpus A vs corpus B, at
    * the cost of the ≤ 63·m-row bucket planes). Same estimator as
    * [[graft.ops.Profile.ksTwoSample]], evaluated at the SKETCH
    * RESOLUTION: both samples are identically bucketed, so
    *
    *   D = max over buckets |cumA·n_B − cumB·n_A| / (n_A·n_B)
    *
    * with the numerator an exact DECIMAL(38,0) integer (one IEEE
    * division at the edge, the q231 discipline) and the verdict the
    * tabulated two-sided coefficient. The grid quantizes: D here is the
    * KS statistic of the BUCKETED distributions (a lower bound of the
    * raw-value D, converging at rate 1/m) — the right trade when the
    * corpora are only retained as sketches. Signed sketches must carry
    * identical affine meta ([[hdrMergeSigned]]'s gate) — strip the meta
    * columns before calling or pass matching sketches; only (bucket,
    * cnt) are read.
    *
    * → one row (n_a, n_b, n_buckets, ks_d, d_crit, reject_same_dist)
    */
  def hdrKsGate(a: DataFrame, b: DataFrame,
                coeff: Double = 1.358): DataFrame = {
    require(coeff > 0, s"coeff must be positive, got $coeff")
    def side(df: DataFrame, name: String) =
      df.select(col("bucket"), col("cnt").as(name))
        .groupBy("bucket").agg(sum(col(name)).as(name))
    val j = side(a, "__ca").join(side(b, "__cb"), Seq("bucket"),
        "full_outer")
      .select(col("bucket"),
        coalesce(col("__ca"), lit(0L)).cast("decimal(38,0)").as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast("decimal(38,0)").as("__cb"))
    // bucket plane is ≤ 63·m rows by construction — the BoundedKey
    // single-partition-window convention
    val bk = graft.functions.ArrayMath.boundedKey(j)
    val wRun = Window.partitionBy(bk).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(bk)
    j.withColumn("__cuma", sum(col("__ca")).over(wRun))
      .withColumn("__cumb", sum(col("__cb")).over(wRun))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .groupBy()
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).as("n_buckets"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("__dnum"))
      .filter(coalesce(
        assert_true(col("__na") > 0 && col("__nb") > 0,
          lit("hdrKsGate: both sketches must be non-empty")),
        lit(true)))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"), col("n_buckets"),
        (col("__dnum").cast("string").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")))
          .as("ks_d"),
        (lit(coeff) * sqrt((col("__na").cast("double") +
          col("__nb").cast("double")) /
          (col("__na").cast("double") * col("__nb").cast("double"))))
          .as("d_crit"))
      .withColumn("reject_same_dist", col("ks_d") > col("d_crit"))
  }

  /** The canonical value formula of a bucket id (the [[hdrQuantile]]
    * estimator): base + (sub·base) div m with e = b div m, sub =
    * b mod m — exact integer SQL, shared by the quantile, EMD and
    * histogram reads so the three can never drift.
    */
  private def bucketValueSql(b: String, m: Int): String =
    s"shiftleft(1L, cast(($b) div $m as int)) + " +
      s"((($b) % $m) * shiftleft(1L, cast(($b) div $m as int))) div $m"

  /** Histogram serving read off an [[hdrSketch]] state — the dashboard
    * projection (per bucket: exact value range, count, running count,
    * cumulative share). `value_hi` is the NEXT bucket id's canonical
    * value (bucket m−1 of an octave rolls to 2·base — the geometric
    * grid is gapless), so ranges tile the OCCUPIED grid exactly: only
    * buckets present in the state emit rows, and a gap between one
    * row's value_hi and the next row's value_lo is a run of zero-count
    * buckets (densify downstream if a renderer needs contiguous
    * rows). All
    * arithmetic on the ≤ 63·m-row state plane; the one division per
    * row is over exact integers < 2^53 (deterministic IEEE, both
    * engines).
    *
    * → (groupCols…, bucket, value_lo, value_hi, cnt, cum_cnt, cum_pct)
    */
  def hdrHistogram(sketch: DataFrame, groupCols: Seq[String],
                   m: Int): DataFrame = {
    require(m >= 2 && m <= 128, s"m must be in [2,128], got $m")
    val parts =
      if (groupCols.nonEmpty) groupCols.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(sketch))
    val wRun = Window.partitionBy(parts: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(parts: _*)
    sketch
      .withColumn("value_lo", expr(bucketValueSql("bucket", m)))
      .withColumn("value_hi", expr(bucketValueSql("bucket + 1", m)))
      .withColumn("cum_cnt", sum(col("cnt")).over(wRun))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .select(groupCols.map(col) ++ Seq(col("bucket"), col("value_lo"),
        col("value_hi"), col("cnt"),
        col("cum_cnt").cast("bigint").as("cum_cnt"),
        (col("cum_cnt").cast("double") / col("__n").cast("double"))
          .as("cum_pct")): _*)
  }

  /** Time-windowed serving read off a PER-DAY [[hdrSketch]] state — the
    * missing piece between the state sinks (which fold all-time) and
    * the drift gates (which compare two states the caller must have
    * kept): keep one leaf per day (`hdrSketch(df, groupCols :+ dayCol,
    * …)`, or a streaming sink keyed the same way) and read any "last N
    * days as of the frontier" window by folding ONLY that window's
    * leaves. Because bucket-count merge is lossless, the window read is
    * BIT-EQUAL to a direct [[hdrSketch]] build over the window's rows
    * (oracle-certified) — feed it straight to [[hdrKsGate]] /
    * [[hdrPsiGate]] / [[hdrEmdGate]] / [[hdrQuantile]].
    *
    * Window = days in (maxDay − endOffset − lastN, maxDay − endOffset],
    * with maxDay the state's GLOBAL day frontier — so
    * (lastN, 0) vs (lastN, lastN) is the standard "this window vs the
    * prior window" drift pair, with no dates hard-coded at call sites.
    *
    * State cost: days · ≤ 63·m rows per group; retention is one filter
    * dropping days older than the largest window served (leaves are
    * independent — eviction never touches surviving reads).
    *
    * → (groupCols…, bucket, cnt)
    */
  def hdrWindowRead(state: DataFrame, groupCols: Seq[String],
                    dayCol: String, lastN: Int,
                    endOffset: Int = 0): DataFrame = {
    require(lastN >= 1, s"lastN must be >= 1, got $lastN")
    require(endOffset >= 0, s"endOffset must be >= 0, got $endOffset")
    val bk = graft.functions.ArrayMath.boundedKey(state)
    val wAll = Window.partitionBy(bk)
    state
      .withColumn("__hi",
        max(col(dayCol)).over(wAll) - lit(endOffset.toLong))
      .filter(col(dayCol) > col("__hi") - lit(lastN.toLong) &&
        col(dayCol) <= col("__hi"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"))
  }

  /** Earth-mover (1-Wasserstein) distance from two [[hdrSketch]]
    * bucket planes — the MASS-TRANSPORT member of the state-only drift
    * trio ([[hdrKsGate]] = max CDF deviation, [[hdrPsiGate]] =
    * relative-likelihood score, this = how far the mass moved, in the
    * VALUE's own units): for the piecewise-constant sketch-resolution
    * CDFs,
    *
    *   W1 = ∫ |F_a(x) − F_b(x)| dx
    *      = Σ_i |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i)
    *
    * over the sorted union bucket plane, with v_i the bucket's
    * canonical lower-bound value (the [[hdrQuantile]] estimator:
    * base + (sub·base) div m — exact integers). The numerator
    * Σ |cumA·nB − cumB·nA|·Δv is EXACT DECIMAL(38,0) arithmetic; one
    * IEEE division by nA·nB at the edge (VARCHAR-bridged), so the row
    * replays bit-for-bit in DuckDB. `emd_norm` = W1 / (v_last −
    * v_first) — the span-normalized [0,1] score for alarm thresholds
    * that must not depend on the value's units. Identical sketches
    * read exactly 0. One window pass over the ≤ 63·m-row union plane;
    * the corpora are never re-read.
    *
    * → one row (n_a, n_b, n_buckets, emd, emd_norm)
    */
  def hdrEmdGate(a: DataFrame, b: DataFrame, m: Int): DataFrame = {
    require(m >= 2 && m <= 128, s"m must be in [2,128], got $m")
    def side(df: DataFrame, name: String) =
      df.select(col("bucket"), col("cnt").as(name))
        .groupBy("bucket").agg(sum(col(name)).as(name))
    val j = side(a, "__ca").join(side(b, "__cb"), Seq("bucket"),
        "full_outer")
      .select(col("bucket"),
        coalesce(col("__ca"), lit(0L)).cast("decimal(38,0)").as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast("decimal(38,0)").as("__cb"))
      // canonical lower-bound value of the bucket (exact integers)
      .withColumn("__v", expr(bucketValueSql("bucket", m)))
    val bk = graft.functions.ArrayMath.boundedKey(j)
    val wRun = Window.partitionBy(bk).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wLead = Window.partitionBy(bk).orderBy(col("bucket"))
    val wAll = Window.partitionBy(bk)
    j.withColumn("__cuma", sum(col("__ca")).over(wRun))
      .withColumn("__cumb", sum(col("__cb")).over(wRun))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      // the deviation after bucket i persists until the NEXT hit
      // bucket's value; the last row's lead is itself (Δv = 0 — and
      // its deviation is |nA·nB − nB·nA| = 0 anyway)
      .withColumn("__dv",
        coalesce(lead(col("__v"), 1).over(wLead), col("__v")) - col("__v"))
      .withColumn("__t",
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")) *
          col("__dv").cast("decimal(38,0)"))
      .withColumn("__vmin", min(col("__v")).over(wAll))
      .withColumn("__vmax", max(col("__v")).over(wAll))
      .groupBy()
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).as("n_buckets"), sum(col("__t")).as("__s"),
        max(col("__vmax") - col("__vmin")).as("__span"))
      .filter(coalesce(
        assert_true(col("__na") > 0 && col("__nb") > 0,
          lit("hdrEmdGate: both sketches must be non-empty")),
        lit(true)))
      // every |cumA·nB − cumB·nA|·Δv term and their sum are bounded by
      // nA·nB·span; past DECIMAL(38,0) the non-ANSI product would go
      // NULL and sum() would silently DROP mass — raise loudly instead
      // (log-space check with a 0.1-decade safety margin; conservative
      // is fine, understated-without-error is not)
      .filter(coalesce(
        assert_true(
          log10(col("__na").cast("double")) +
            log10(col("__nb").cast("double")) +
            log10(greatest(col("__span").cast("double"), lit(1.0))) <
            lit(37.9),
          lit("hdrEmdGate: n_a*n_b*span exceeds DECIMAL(38,0) " +
            "headroom — the exact numerator would overflow; gate " +
            "narrower windows or downsample one side")),
        lit(true)))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"), col("n_buckets"),
        (col("__s").cast("string").cast("double") /
          (col("__na").cast("bigint").cast("double") *
            col("__nb").cast("bigint").cast("double"))).as("emd"),
        when(col("__span") > 0,
          col("__s").cast("string").cast("double") /
            (col("__na").cast("bigint").cast("double") *
              col("__nb").cast("bigint").cast("double") *
              col("__span").cast("bigint").cast("double")))
          .otherwise(lit(0.0)).as("emd_norm"))
  }

  /** Population-stability / Jensen–Shannon drift score from two
    * [[hdrSketch]] bucket planes — the SCORED sibling of [[hdrKsGate]]
    * (KS answers "same distribution?"; PSI is the industry-standard
    * drift MAGNITUDE real feature pipelines alarm on, with the
    * conventional <0.1 stable / 0.1–0.25 moderate / >0.25 shifted
    * bands). Both scores are closed-form folds over the persisted
    * ≤ 63·m-row union bucket plane — yesterday's sketch vs today's,
    * no corpus re-scan:
    *
    *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
    *   JS  = ½ Σ_b [ p_b·ln(2p_b/(p_b+q_b)) + q_b·ln(2q_b/(p_b+q_b)) ]
    *
    * with Laplace-smoothed proportions p_b = (ca+1)/(n_a+B),
    * q_b = (cb+1)/(n_b+B) over the B union buckets — the standard
    * empty-bucket convention (raw PSI is undefined on a bucket one
    * side never hit, which on sketch planes happens constantly), and
    * an EXACT one: every input to every ln is a ratio of exact
    * integers, so identical sketches read PSI = JS = 0.0 exactly
    * (every ln(1) term is 0).
    *
    * Determinism (the q109 discipline): each term is ONE ln over a
    * fixed IEEE ratio of exact integer-derived doubles, cast to
    * DECIMAL(18,12) and summed as decimals (order-independent), then
    * bridged to double via the string route — replays bit-for-bit in
    * DuckDB. JS is bounded by ln 2 ≈ 0.693; PSI of heavy drift on a
    * 63·m plane stays ≪ 10^6, inside DECIMAL(18,12)'s integer digits.
    *
    * → one row (n_a, n_b, n_buckets, psi, js_divergence, drift_alert)
    */
  def hdrPsiGate(a: DataFrame, b: DataFrame,
                 psiAlert: Double = 0.2): DataFrame = {
    require(psiAlert > 0, s"psiAlert must be positive, got $psiAlert")
    def side(df: DataFrame, name: String) =
      df.select(col("bucket"), col("cnt").as(name))
        .groupBy("bucket").agg(sum(col(name)).as(name))
    val j = side(a, "__ca").join(side(b, "__cb"), Seq("bucket"),
        "full_outer")
      .select(col("bucket"),
        coalesce(col("__ca"), lit(0L)).cast("bigint").as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast("bigint").as("__cb"))
    val bk = graft.functions.ArrayMath.boundedKey(j)
    val wAll = Window.partitionBy(bk)
    val withTotals = j
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__bc", count(lit(1)).over(wAll))
    // smoothed proportions — every operand an exact integer rendered
    // once to double, then a FIXED IEEE sequence (same in DuckDB)
    val x = (col("__ca") + 1L).cast("double") /
      (col("__na") + col("__bc")).cast("double")
    val y = (col("__cb") + 1L).cast("double") /
      (col("__nb") + col("__bc")).cast("double")
    // ln(p/q) over the integer-product ratio (exact operands) rather
    // than ln(x)-ln(y) (two libm calls compound ulps)
    val lnPq = log(
      ((col("__ca") + 1L).cast("double") *
        (col("__nb") + col("__bc")).cast("double")) /
      ((col("__cb") + 1L).cast("double") *
        (col("__na") + col("__bc")).cast("double")))
    val psiTerm = ((x - y) * lnPq).cast("decimal(18,12)")
    val jsTerm = ((x * log(lit(2.0) * x / (x + y)) +
      y * log(lit(2.0) * y / (x + y))) * lit(0.5)).cast("decimal(18,12)")
    withTotals
      .withColumn("__psi_t", psiTerm)
      .withColumn("__js_t", jsTerm)
      .groupBy()
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).as("n_buckets"),
        sum(col("__psi_t")).as("__psi"), sum(col("__js_t")).as("__js"))
      .filter(coalesce(
        assert_true(col("__na") > 0 && col("__nb") > 0,
          lit("hdrPsiGate: both sketches must be non-empty")),
        lit(true)))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"), col("n_buckets"),
        col("__psi").cast("string").cast("double").as("psi"),
        col("__js").cast("string").cast("double").as("js_divergence"))
      .withColumn("drift_alert", col("psi") > lit(psiAlert))
  }

  /** Point-query a [[cmsSketch]] for a candidate key set: est(key) =
    * min over rows of the key's bucket counter (0 if the bucket is
    * empty — the key was never seen). The sketch side is depth·width
    * rows and broadcasts; the candidate side never shuffles. At 100 TB
    * the candidates come from a sample or a prior — the sketch answers
    * frequency queries without re-scanning the corpus.
    *
    * → (keyCol, est)
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val probes = keys.select(col(keyCol)).distinct()
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket",
        cmsBucket(col("row"), col(keyCol).cast("string"), width))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. AofA'07) — the industry-standard
  // register sketch, completing the distinct-count family next to KMV:
  // fixed 2^p registers per group regardless of cardinality (vs KMV's
  // k hash rows), mergeable by register-wise MAX, standard error
  // 1.04/sqrt(2^p). Same determinism contract as the rest of this
  // file: md5-derived 48-bit hash, no seed, no implementation-defined
  // layout — the registers AND the estimate replay bit-for-bit in any
  // engine with md5 (unlike Spark's built-in HLL++ whose register
  // encoding is private), which is what makes the sketch a cross-
  // engine data contract.

  /** Registers of a HyperLogLog sketch per group: bucket = top p bits
    * of the 48-bit hash, rho = position of the leftmost 1-bit in the
    * remaining 48−p bits (1-based; 48−p+1 when all zero), register =
    * MAX(rho) per bucket. Only HIT buckets get a row (sparse — a
    * low-cardinality group costs rows ∝ its cardinality, never 2^p);
    * absent buckets are implicitly 0. Order-independent and
    * layout-invariant by construction (MAX commutes).
    *
    * p ∈ [7,14] so the single standard bias constant
    * α_m = 0.7213/(1 + 1.079/m) applies (Flajolet §4 gives separate
    * constants only below m=128).
    *
    * → (groupCols…, bucket, rho_max)
    */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                p: Int = 9): DataFrame = {
    require(p >= 7 && p <= 14, s"HLL needs p in [7,14], got $p")
    val wBits = 48 - p
    val mask = (1L << wBits) - 1L
    val d = df
      .select((groupCols.map(col) :+ col(valueCol)): _*)
      .filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        h48(col(valueCol).cast("string")).as("__h"): _*)
      .withColumn("bucket", shiftright(col("__h"), wBits))
      .withColumn("__w", col("__h").bitwiseAND(lit(mask)))
      // leftmost-1 position via the bin() length — exact integer
      // arithmetic, no float log2 boundary (both engines render bin()
      // without leading zeros)
      .withColumn("__rho",
        when(col("__w") === 0L, lit((wBits + 1).toLong))
          .otherwise(lit((wBits + 1).toLong) - length(bin(col("__w")))))
    d.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("rho_max"))
  }

  /** Exact merge of [[hllSketch]]es: union, register-wise MAX — the
    * sketch of the union (MAX is associative/commutative/idempotent,
    * so per-partition / per-day sketches roll up bit-identically to a
    * direct build, the [[kmvSketch]] mergeability contract).
    */
  def hllMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho_max")).as("rho_max"))
  }

  /** Cardinality estimate per group off a [[hllSketch]]: the harmonic
    * mean of the register powers, E = α_m·m²/Σ_j 2^(−M_j), with
    * Flajolet's small-range linear-counting correction m·ln(m/V) when
    * E ≤ 2.5m and V (= empty registers) > 0. (The large-range
    * correction kicks in past 2^48/30 ≈ 9·10^12 distincts — beyond the
    * 48-bit hash contract; not implemented.)
    *
    * Determinism: Σ 2^(−M_j) is computed as the EXACT integer
    * Σ 2^(R−M_j) with R = 48−p+1 (≤ 2^p·2^R < 2^56 — no overflow, no
    * float accumulation; absent registers contribute 2^R each), then
    * the estimate is a fixed IEEE sequence over exact inputs; the ln
    * of the linear-counting branch routes through DECIMAL(18,12) (the
    * mutualInformation recipe).
    *
    * → (groupCols…, n_registers_hit, estimate)
    */
  /** 2^(R−M_j) per register row — the exact-integer register power the
    * estimate sums; ONE spelling shared by [[hllEstimate]] and the
    * fused HyperBall reads in [[graft.ops.WebGraph]].
    */
  private[ops] def hllShiftT(p: Int): org.apache.spark.sql.Column =
    expr(s"shiftleft(CAST(1 AS BIGINT), ${48 - p + 1} " +
      "- CAST(rho_max AS INT))")

  /** The q239-certified estimate from a per-group register aggregation
    * (`hit` = registers hit, `sumT` = Σ 2^(R−M_j) over them): harmonic
    * mean with Flajolet's linear-counting small-range branch, the ln
    * DECIMAL(18,12)-routed. ONE spelling shared by [[hllEstimate]] and
    * the fused HyperBall reads — the two can never drift.
    */
  private[ops] def hllEstimateExpr(hit: org.apache.spark.sql.Column,
                                   sumT: org.apache.spark.sql.Column,
                                   p: Int): org.apache.spark.sql.Column = {
    val m = 1L << p
    val bigR = 48 - p + 1
    val p2R = math.pow(2.0, bigR.toDouble) // exact power of two
    val mD = lit(m.toDouble)
    // absent registers: rho 0 → 2^R each
    val sAll = sumT + (lit(m) - hit) * lit(1L << bigR)
    val v = lit(m) - hit
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / mD)
    val eRaw = alpha * mD * mD * lit(p2R) / sAll.cast("double")
    when(eRaw <= lit(2.5) * mD && v > 0,
      (mD * log(mD / v.cast("double")))
        .cast("decimal(18,12)").cast("double"))
      .otherwise(eRaw)
  }

  def hllEstimate(sketch: DataFrame, groupCols: Seq[String],
                  p: Int = 9): DataFrame = {
    require(p >= 7 && p <= 14, s"HLL needs p in [7,14], got $p")
    sketch
      .withColumn("__t", hllShiftT(p))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_registers_hit"), sum(col("__t")).as("__s"))
      .select(groupCols.map(col) :+ col("n_registers_hit") :+
        hllEstimateExpr(col("n_registers_hit"), col("__s"), p)
          .as("estimate"): _*)
  }

  /** One-call convenience: HLL sketch then estimate. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 9): DataFrame =
    hllEstimate(hllSketch(df, groupCols, valueCol, p), groupCols, p)

  /** Set-overlap estimates from TWO [[hllSketch]] register states —
    * the counting sibling of [[hdrKsGate]]'s "compare from state
    * alone" lane: user overlap between cohorts, vocabulary overlap
    * between corpora, judged from retained sketches without touching
    * either corpus. The union sketch is the register-wise MAX (exact —
    * the sketch of the union, not an estimate of it); the intersection
    * is inclusion–exclusion over the three estimates,
    *
    *   |A∩B|est = max(0, E_A + E_B − E_A∪B),  Ĵ = |A∩B|est / E_A∪B
    *
    * — the standard HLL overlap recipe (no MinHash needed when only
    * register state was kept; error compounds three estimator σs, so
    * small overlaps read noisy — [[kmvJaccardPairs]] is the tighter
    * tool when raw values are still available). Deterministic: every
    * input is the q239-replayable estimate arithmetic, then a fixed
    * IEEE sequence. Empty sketches raise (an absent cohort is a
    * contract error, not a zero).
    *
    * → one row (est_a, est_b, est_union, est_intersection, jaccard_est)
    */
  def hllOverlap(a: DataFrame, b: DataFrame, p: Int = 9): DataFrame = {
    def est1(sk: DataFrame, name: String) =
      hllEstimate(sk.select(col("bucket"), col("rho_max")), Seq.empty, p)
        .select(col("estimate").as(name))
    val u = hllMerge(Seq.empty, a, b)
    est1(a, "est_a").crossJoin(est1(b, "est_b")) // three 1-row frames
      .crossJoin(est1(u, "est_union"))
      .filter(coalesce(
        assert_true(col("est_a").isNotNull && col("est_b").isNotNull,
          lit("hllOverlap: both sketches must be non-empty")),
        lit(true)))
      .withColumn("est_intersection",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_est",
        col("est_intersection") / col("est_union"))
  }

  /** AMS (Alon–Matias–Szegedy, STOC'96 — the Gödel-Prize frequency-
    * moments paper) F2 sketch: per group, `counters` signed counters,
    * each the sum of a deterministic ±1 hash sign over the rows —
    * register_j = Σ_v f_v·s_j(v) with s_j(v) = ±1 from bit 0 of
    * h48(j ":" v). E[register²] = F2 = Σ_v f_v², the self-join /
    * repeated-value mass that sizes skew-sensitive shuffles (F2 is what
    * a join on this key produces; [[kmvSketch]] is F0, [[cmsSketch]]
    * point-estimates f_v — this completes the frequency-moment family).
    *
    * Mergeable EXACTLY: registers are sums, so [[amsMerge]]'s
    * register-wise ADD gives bit-identically the sketch of the union
    * (per-partition / per-day sketches roll up without rescan).
    *
    * Scale shape: the corpus compresses to the distinct-value plane in
    * one aggregation (map-side combined); the ×counters expansion rides
    * that skinny plane, never the corpus. Registers are exact BIGINTs
    * (|register| ≤ group rows).
    *
    * → (groupCols…, counter, register)
    */
  def amsSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                counters: Int = 63): DataFrame = {
    require(counters >= 1 && counters % 2 == 1,
      s"AMS needs an odd counter count (exact integer median), got $counters")
    val vc = df
      .select(groupCols.map(col) :+
        col(valueCol).cast("string").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__f"))
    vc.withColumn("counter",
        explode(lit((0 until counters).toArray)))
      .withColumn("__s",
        when(h48(concat(col("counter").cast("string"), lit(":"),
          col("__v"))).bitwiseAND(lit(1L)) === 0L, lit(1L))
          .otherwise(lit(-1L)))
      .groupBy(groupCols.map(col) :+ col("counter"): _*)
      .agg(sum(col("__f") * col("__s")).as("register"))
  }

  /** Exact merge of [[amsSketch]]es: union, register-wise SUM — the
    * sketch of the concatenated inputs (sums are associative/
    * commutative, the [[kmvSketch]]/[[hllMerge]] mergeability
    * contract; unlike those, AMS merges disjoint MULTISET unions —
    * re-observed values keep accumulating correctly).
    */
  def amsMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "amsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("counter")): _*)
      .agg(sum(col("register")).as("register"))
  }

  /** F2 estimate per group off an [[amsSketch]]: the MEDIAN of the
    * squared registers (the AMS median-of-estimators step; `counters`
    * is odd so the median is one exact element, rank (c+1)/2 on
    * (register², counter) — no interpolation, no float). Squares ride
    * DECIMAL(38,0) (register² overflows long past ~3·10^9 rows); the
    * estimate returns as one bridged double.
    *
    * → (groupCols…, f2_estimate)
    */
  def amsEstimate(sketch: DataFrame, groupCols: Seq[String],
                  counters: Int = 63): DataFrame = {
    require(counters >= 1 && counters % 2 == 1,
      s"AMS needs an odd counter count, got $counters")
    // empty groupCols = one global estimate: partition the bounded
    // `counters`-row plane by a non-foldable constant key (the
    // [[hdrQuantile]]/BoundedKey convention) rather than an
    // empty-partitionSpec window
    val parts =
      if (groupCols.nonEmpty) groupCols.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(sketch))
    val w = Window.partitionBy(parts: _*)
      .orderBy(col("__sq"), col("counter")) // bounded: `counters` rows/group
    sketch
      .withColumn("__sq",
        col("register").cast("decimal(38,0)") * col("register"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === (counters + 1) / 2)
      .select(groupCols.map(col) :+
        col("__sq").cast("string").cast("double").as("f2_estimate"): _*)
  }

  // --- top-k heavy-hitters summary (mergeable, deterministic) --------------
  //
  // The frequent-items member of the sketch family ("what are the top
  // URLs/tokens/keys, and did they shift?" — the most common drift
  // question after distinct-count and quantiles). Misra–Gries (1982)
  // and SpaceSaving (Metwally et al. ICDT'05) keep bounded counter
  // sets, but their classical forms decrement/evict as elements ARRIVE
  // — the surviving counter VALUES depend on processing and merge
  // order, so two runs over different partitionings of the same bag
  // disagree bit-for-bit, which breaks this repo's oracle discipline
  // (no engine-independent SQL can replay a partition-dependent
  // state). This is the ORDER-FREE formulation of the same summary,
  // the "top-k with residual thresholds" shape mergeable-summaries
  // theory reduces MG to (Agarwal, Cormode, Huang, Phillips, Wei, Yi —
  // PODS'12 "Mergeable Summaries"): a LEAF summary is the exact top-k
  // of one bounded slice (a day, a source, a micro-batch) plus two
  // scalars (total mass, largest dropped count), and MERGE is pure
  // counter ADDITION — associative, commutative, bit-exact, so a tree
  // of merges equals a flat merge exactly and the whole pipeline
  // replays in DuckDB.
  //
  // State layout (uniform skinny rows, ≤ leaves·k + 1 per group):
  //   item rows:  (groupCols…, item, cnt, tseen)
  //     cnt   = Σ exact counts over leaves where the item was KEPT
  //     tseen = Σ of those leaves' thresholds
  //   meta row:   (groupCols…, item = NULL, cnt = N, tseen = T)
  //     N = Σ leaf total occurrences,  T = Σ leaf thresholds
  // A leaf's threshold t = the (k+1)-th largest count (0 when nothing
  // was dropped): every dropped item's count is ≤ t by construction.
  // Deterministic bounds carried in-band at read time:
  //   lb(x) = cnt                  (true count can only be larger)
  //   ub(x) = cnt + (T − tseen)    (absent leaves contribute ≤ t each)
  //   absent items: c(x) ≤ T      (dropped in EVERY leaf)

  /** Build the summary. Without `leafCols` the input is ONE leaf (the
    * exact top-k — useful alone, or as the increment a streaming wave
    * contributes); with `leafCols` (e.g. a day or source column) each
    * leaf is summarized exactly and the leaves are merged — the
    * incremental-rollup shape, bit-identical to [[topkMerge]] of the
    * per-leaf builds, so per-day states roll up without rescanning
    * history.
    *
    * Scale shape: ONE aggregation to the exact (group, leaf, item)
    * count plane (map-side combined — the same shuffle an exact top-k
    * pays), then windows over per-(group, leaf) planes and a skinny
    * state merge. Items render as strings (layout-invariant, the
    * [[kmvSketch]] convention); NULL items are excluded. Ties break by
    * (count desc, item asc) everywhere — deterministic, replayable.
    *
    * → (groupCols…, item, cnt, tseen) + one item-NULL meta row per group
    */
  def topkSketch(df: DataFrame, groupCols: Seq[String], itemCol: String,
                 k: Int, leafCols: Seq[String] = Seq.empty): DataFrame = {
    require(k >= 1, s"topkSketch needs k >= 1, got $k")
    val gl = groupCols ++ leafCols
    val counts = df
      .select(gl.map(col) :+ col(itemCol).cast("string").as("__i"): _*)
      .filter(col("__i").isNotNull)
      .groupBy(gl.map(col) :+ col("__i"): _*)
      .agg(count(lit(1)).as("__c"))
    val parts =
      if (gl.nonEmpty) gl.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(counts))
    val w = Window.partitionBy(parts: _*)
      .orderBy(col("__c").desc, col("__i"))
    val wAll = Window.partitionBy(parts: _*)
    val ranked = counts
      .withColumn("__r", row_number().over(w))
      // leaf threshold = the (k+1)-th largest count — the LARGEST
      // dropped count, 0 when the leaf kept everything
      .withColumn("__t", coalesce(
        max(when(col("__r") === k + 1, col("__c"))).over(wAll), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val kept = ranked.filter(col("__r") <= k)
      .select(gl.map(col) :+ col("__i").as("item") :+
        col("__c").as("cnt") :+ col("__t").as("tseen"): _*)
    val meta = ranked.filter(col("__r") === 1) // one row per (group, leaf)
      .select(gl.map(col) :+ lit(null).cast("string").as("item") :+
        col("__n").as("cnt") :+ col("__t").as("tseen"): _*)
    val leaves = kept.unionByName(meta)
    if (leafCols.isEmpty) leaves
    else leaves // merge across leaves: pure counter addition
      .groupBy(groupCols.map(col) :+ col("item"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"),
        coalesce(sum(col("tseen")).cast("bigint"), lit(0L)).as("tseen"))
  }

  /** Exact merge of [[topkSketch]] states: union, per-(group, item)
    * counter ADDITION (the meta rows fold the same way — NULL groups as
    * its own key). Associative and commutative, so any merge tree over
    * the same leaves is bit-identical to a flat merge (asserted in
    * SketchesSpec) — per-day / per-source / per-wave states roll up
    * without rescanning history. One shuffle of the skinny state union.
    */
  def topkMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "topkMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("item"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"),
        coalesce(sum(col("tseen")).cast("bigint"), lit(0L)).as("tseen"))
  }

  /** Heavy-hitters read off a [[topkSketch]] state, the deterministic
    * frequency bounds IN-BAND: per group the top `k` state items by
    * (cnt_lb desc, item asc) with
    *
    *   cnt_lb ≤ true count ≤ cnt_ub = cnt_lb + (T − tseen)
    *
    * and `absent_bound` = T carried on every row: ANY item not in the
    * underlying state (dropped in every leaf) has true count ≤ T, so an
    * item is GUARANTEED top-of-corpus whenever its cnt_lb beats every
    * other item's cnt_ub and T. All arithmetic on the ≤ leaves·k-row
    * state plane — the corpus is never re-read. Empty groupCols = one
    * global read (bounded plane, [[graft.functions.BoundedKey]] window
    * key). Raises on a state with no meta row (not a [[topkSketch]]).
    *
    * → (groupCols…, rank, item, cnt_lb, cnt_ub, n_total, absent_bound)
    */
  def topkHeavyHitters(sketch: DataFrame, groupCols: Seq[String],
                       k: Int): DataFrame = {
    require(k >= 1, s"topkHeavyHitters needs k >= 1, got $k")
    val meta = sketch.filter(col("item").isNull)
      .select(groupCols.map(col) :+ col("cnt").as("__N") :+
        col("tseen").as("__T"): _*)
    val items = sketch.filter(col("item").isNotNull)
    val joined =
      if (groupCols.nonEmpty) items.join(meta, groupCols)
      else items.crossJoin(broadcast(meta)) // exactly one global meta row
    val parts =
      if (groupCols.nonEmpty) groupCols.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(joined))
    val w = Window.partitionBy(parts: _*)
      .orderBy(col("cnt").desc, col("item"))
    joined
      .filter(coalesce(
        assert_true(col("__N").isNotNull,
          lit("topkHeavyHitters: state has no meta row — not a topkSketch")),
        lit(true)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(groupCols.map(col) :+ col("rank") :+ col("item") :+
        col("cnt").as("cnt_lb") :+
        (col("cnt") + col("__T") - col("tseen")).as("cnt_ub") :+
        col("__N").as("n_total") :+ col("__T").as("absent_bound"): _*)
  }

  /** Re-truncation for long-lived states (years of daily leaves grow
    * the state ~leaves·k rows/group): keep the `k` best items by
    * (cnt desc, item asc), fold every dropped item into the absent
    * bound — the new meta T' = max(T, max dropped ub), so both
    * guarantees SURVIVE compaction (kept items' ub can only loosen,
    * dropped items are covered by "absent ⇒ ≤ T'"). Lossy by design —
    * the one step that is NOT bit-neutral to merge trees — so it is
    * explicit and opt-in, never applied inside [[topkMerge]].
    */
  def topkCompact(sketch: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame = {
    require(k >= 1, s"topkCompact needs k >= 1, got $k")
    val meta = sketch.filter(col("item").isNull)
      .select(groupCols.map(col) :+ col("cnt").as("__N") :+
        col("tseen").as("__T"): _*)
    val items = sketch.filter(col("item").isNotNull)
    val joined =
      if (groupCols.nonEmpty) items.join(meta, groupCols)
      else items.crossJoin(broadcast(meta))
    val parts =
      if (groupCols.nonEmpty) groupCols.map(col)
      else Seq(graft.functions.ArrayMath.boundedKey(joined))
    val w = Window.partitionBy(parts: _*)
      .orderBy(col("cnt").desc, col("item"))
    val wAll = Window.partitionBy(parts: _*)
    val ranked = joined
      .withColumn("__r", row_number().over(w))
      .withColumn("__ub", col("cnt") + col("__T") - col("tseen"))
      .withColumn("__tNew", greatest(col("__T"), coalesce(
        max(when(col("__r") > k, col("__ub"))).over(wAll), lit(0L))))
    val kept = ranked.filter(col("__r") <= k)
      .select(groupCols.map(col) :+ col("item") :+ col("cnt") :+
        // keep ub invariant under the T bump: tseen' = tseen + (T'−T)
        (col("tseen") + col("__tNew") - col("__T")).as("tseen"): _*)
    val newMeta = ranked.filter(col("__r") === 1)
      .select(groupCols.map(col) :+ lit(null).cast("string").as("item") :+
        col("__N").as("cnt") :+ col("__tNew").as("tseen"): _*)
    kept.unionByName(newMeta)
  }

  /** Time-windowed serving read off a PER-DAY [[topkSketch]] state —
    * the [[hdrWindowRead]] sibling for the frequent-items plane: keep
    * one leaf per day (`topkSketch(df, groupCols :+ dayCol, item, k)`,
    * or [[topkRegisters]] state keyed the same way) and fold ONLY the
    * window's leaves by the [[topkMerge]] counter addition (meta rows
    * fold alongside — NULL item is its own group). The result is
    * EXACTLY `topkSketch(window rows, groupCols, item, k,
    * leafCols = Seq(dayCol))` — the per-day-leaf build over the
    * window, with the same deterministic in-band bounds
    * (oracle-certified) — servable by [[topkHeavyHitters]] /
    * [[topkShift]] for "this week's heavy items vs last week's".
    *
    * Window semantics and state cost follow [[hdrWindowRead]]: days in
    * (maxDay − endOffset − lastN, maxDay − endOffset] against the
    * state's global day frontier; days · ≤ (k+1) rows per group;
    * retention = drop expired days (then [[topkCompact]] per surviving
    * day if k was widened).
    *
    * → (groupCols…, item, cnt, tseen)
    */
  def topkWindowRead(state: DataFrame, groupCols: Seq[String],
                     dayCol: String, lastN: Int,
                     endOffset: Int = 0): DataFrame = {
    require(lastN >= 1, s"lastN must be >= 1, got $lastN")
    require(endOffset >= 0, s"endOffset must be >= 0, got $endOffset")
    val bk = graft.functions.ArrayMath.boundedKey(state)
    val wAll = Window.partitionBy(bk)
    state
      .withColumn("__hi",
        max(col(dayCol)).over(wAll) - lit(endOffset.toLong))
      .filter(col(dayCol) > col("__hi") - lit(lastN.toLong) &&
        col(dayCol) <= col("__hi"))
      .groupBy(groupCols.map(col) :+ col("item"): _*)
      .agg(coalesce(sum(col("cnt")).cast("bigint"), lit(0L)).as("cnt"),
        coalesce(sum(col("tseen")).cast("bigint"), lit(0L)).as("tseen"))
  }

  /** "Did the top keys SHIFT?" — the frequent-items drift read
    * completing the state-only comparison trio ([[hdrKsGate]] same
    * distribution?, [[hdrPsiGate]] how far?, this: WHICH heavy items
    * moved): full-outer-compare the top-k reads of two [[topkSketch]]
    * states (yesterday vs today, cohort A vs cohort B) with the
    * deterministic bounds carried from BOTH sides. An item absent from
    * a side's top-k keeps that side's evidence honest: bounds fall
    * back to [0, side's absent_bound] when the item is missing from
    * the side's STATE entirely (it may still be anything up to T), or
    * to its state row's bounds when it merely missed the top-k cut.
    * `status` is the a→b transition: entered (b's top-k only), left
    * (a's only), stayed (both).
    *
    * All arithmetic on the two bounded state planes — no corpus
    * re-scan; deterministic ties everywhere, so the whole comparison
    * replays in DuckDB.
    *
    * → (groupCols…, item, status, rank_a, rank_b,
    *    cnt_lb_a, cnt_ub_a, cnt_lb_b, cnt_ub_b)
    */
  def topkShift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                k: Int): DataFrame = {
    require(k >= 1, s"topkShift needs k >= 1, got $k")
    def side(s: DataFrame, tag: String) = {
      // the meta row as a 1-row-per-group (or 1-row global) frame: the
      // GLOBAL spelling aggregates so an EMPTY state still yields one
      // all-NULL row — the in-plan contract assert below can then fire
      // (a crossJoin against a zero-row meta would silently empty the
      // whole comparison instead)
      val metaRows = s.filter(col("item").isNull)
      val meta =
        if (groupCols.nonEmpty) metaRows
          .select(groupCols.map(col) :+ col("cnt").as(s"__n_$tag") :+
            col("tseen").as(s"__t_$tag"): _*)
        else metaRows.agg(max(col("cnt")).as(s"__n_$tag"),
          max(col("tseen")).as(s"__t_$tag"))
      def withMeta(df: DataFrame, how: String) =
        if (groupCols.nonEmpty) df.join(meta, groupCols, how)
        else df.crossJoin(broadcast(meta))
      // state-level bounds for items that missed the top-k CUT but are
      // in the state — their evidence is their state row, not [0, T]
      val bounds = withMeta(s.filter(col("item").isNotNull), "inner")
        .select(groupCols.map(col) :+ col("item") :+
          col("cnt").as(s"cnt_lb_$tag") :+
          (col("cnt") + col(s"__t_$tag") - col("tseen"))
            .as(s"cnt_ub_$tag"): _*)
      val ranks = topkHeavyHitters(s, groupCols, k)
        .select(groupCols.map(col) :+ col("item") :+
          col("rank").as(s"rank_$tag"): _*)
      (ranks, bounds, withMeta(_: DataFrame, "left"))
    }
    val (ra, ba, withMetaA) = side(a, "a")
    val (rb, bb, withMetaB) = side(b, "b")
    val keys = groupCols :+ "item"
    val joined = withMetaB(withMetaA(
      ra.join(rb, keys, "full_outer")
        .join(ba, keys, "left").join(bb, keys, "left")))
    joined
      .filter(coalesce(
        assert_true(col("__n_a").isNotNull && col("__n_b").isNotNull,
          lit("topkShift: both states need a meta row for every " +
            "compared group — not a topkSketch, or an absent cohort")),
        lit(true)))
      .select(groupCols.map(col) ++ Seq(
        col("item"),
        when(col("rank_a").isNull, lit("entered"))
          .when(col("rank_b").isNull, lit("left"))
          .otherwise(lit("stayed")).as("status"),
        col("rank_a"), col("rank_b"),
        coalesce(col("cnt_lb_a"), lit(0L)).as("cnt_lb_a"),
        coalesce(col("cnt_ub_a"), col("__t_a"), lit(0L)).as("cnt_ub_a"),
        coalesce(col("cnt_lb_b"), lit(0L)).as("cnt_lb_b"),
        coalesce(col("cnt_ub_b"), col("__t_b"), lit(0L)).as("cnt_ub_b")): _*)
  }

  /** The streaming half: explode a [[topkSketch]] state into REGISTER
    * rows (groupCols…, item, reg, v) with reg ∈ {cnt, tseen} — every
    * register merges by SUM, so
    * `aggStateSink(topkRegisters(topkSketch(batch…)), keyCols =
    * group :+ item :+ reg, valueCol = "v", scale = 0)` folds micro-
    * batch leaves into persisted state whose `sum_v` per key equals a
    * batch [[topkMerge]] of the same leaves register-for-register
    * (asserted in StreamingAggSpec); [[topkFromRegisters]] rebuilds the
    * servable state.
    */
  def topkRegisters(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.select(groupCols.map(col) :+ col("item") :+
        map(lit("cnt"), col("cnt"), lit("tseen"), col("tseen")).as("__m"): _*)
      .select(groupCols.map(col) :+ col("item") :+
        explode(col("__m")).as(Seq("reg", "v")): _*)

  /** Rebuild a [[topkSketch]] state frame from persisted register rows
    * (the aggStateSink read path: key columns + `sum_v`).
    */
  def topkFromRegisters(state: DataFrame, groupCols: Seq[String],
                        valueCol: String = "sum_v"): DataFrame =
    state.groupBy(groupCols.map(col) :+ col("item"): _*)
      .agg(
        coalesce(sum(when(col("reg") === "cnt", col(valueCol)))
          .cast("bigint"), lit(0L)).as("cnt"),
        coalesce(sum(when(col("reg") === "tseen", col(valueCol)))
          .cast("bigint"), lit(0L)).as("tseen"))
}
