package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: the partitioning/bucketing/skew patterns that make the
  * engine's joins hold up at 100 TB (SURVEY.md §4.3; north-star mandate).
  */
object ScaleOps {

  /** Write a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join WITHOUT a shuffle exchange on either side —
    * the physical plan co-locates by bucket id. This is the preparation
    * step for any fact-to-fact join that repeats across workloads: pay the
    * shuffle once at write time, never at query time.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Salted join for a skewed LEFT key: the left side gets a random salt in
    * [0, salts), the right side is replicated once per salt value, and the
    * join key becomes (key, salt) — a hot key's rows spread over `salts`
    * partitions instead of one straggler task. AQE's skew-join handles
    * moderate skew automatically; explicit salting is for the pathological
    * key whose single value exceeds an executor.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (abs(hash(monotonically_increasing_id())) % salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(typedLit((0 until salts).toList)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Range-repartition + sort-within-partitions by a time/sequence column
    * before a partitioned write: downstream scans of one partition read
    * locally sorted data (min/max pruning inside files is tight).
    */
  def writeTimePartitioned(df: DataFrame, path: String, partitionCol: String,
                           sortCol: String, targetPartitions: Int): Unit =
    df.repartitionByRange(targetPartitions, col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** SCD1 merge (MERGE INTO … WHEN MATCHED UPDATE, WHEN NOT MATCHED
    * INSERT, for whole rows): updates win on key collision, unmatched base
    * rows survive, unmatched updates insert. One left-anti join — when the
    * update batch is small relative to the base (the overwhelmingly common
    * incremental case) AQE broadcasts it, so the 100 TB base is scanned
    * once with NO base-side shuffle; the alternative full-outer-join
    * formulation shuffles BOTH sides on the key.
    *
    * MERGE edge semantics (SQL MERGE errors on them; silent variants
    * corrupt the table):
    *   - NULL keys in `updates` always fail: a null key matches nothing in
    *     the anti-join (SQL null semantics), so such a row would re-insert
    *     on EVERY run — rejected with a distributed `assert_true` (no
    *     driver-side scan of the batch).
    *   - Duplicate keys in `updates`: with `orderCol = Some(c)` the row
    *     with the LARGEST `c` wins per key (last-wins by version/timestamp;
    *     deterministic when (keyCols, c) is unique). With `orderCol = None`
    *     uniqueness is a runtime-ENFORCED precondition — a duplicate has no
    *     well-defined winner, so the batch fails rather than appending two
    *     rows for one key (what the naive union would do). Both checks
    *     cost one window pass over the (small, broadcast-bound) update
    *     batch — never over the base.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
             orderCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val winners = mergeWinners(updates, keyCols, orderCol, "upsert")
    base.join(winners.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(winners)
  }

  /** The MERGE-batch preamble shared by [[upsert]] and [[upsertScd2]]:
    * reject NULL keys distributed, then resolve duplicate keys (largest
    * `orderCol` wins; without one, uniqueness is runtime-ENFORCED). One
    * window pass over the (small, broadcast-bound) batch — never the base.
    */
  private def mergeWinners(updates: DataFrame, keyCols: Seq[String],
                           orderCol: Option[String], opName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // assert_true wrapped in a coalesce-to-true filter: evaluates per row
    // (throws on violation), passes every surviving row — and, unlike a
    // projected-then-dropped check column, cannot be pruned away.
    val keysNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val nullChecked = updates.filter(coalesce(
      assert_true(keysNotNull, concat_ws("", lit(s"$opName: NULL in key ("),
        lit(keyCols.mkString(", ")),
        lit(") — a null key never matches MERGE ON and would re-insert every run"))),
      lit(true)))
    orderCol match {
      case Some(c) =>
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(c).desc)
        nullChecked.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None =>
        val w = Window.partitionBy(keyCols.map(col): _*)
        nullChecked.withColumn("__kn", count(lit(1)).over(w))
          .filter(coalesce(
            assert_true(col("__kn") === 1, concat_ws("",
              lit(s"$opName: duplicate key ("), concat_ws(", ", keyCols.map(col): _*),
              lit(") in updates with no orderCol — pass orderCol to pick a winner"))),
            lit(true)))
          .drop("__kn")
    }
  }

  /** SCD Type-2 (history-keeping) merge: where [[upsert]] REPLACES a
    * matched row, this CLOSES the current version and appends the new one
    * — the dimension keeps full history under effective-dating columns.
    *
    * Schema contract: `base` = attribute columns + (`validFromCol`,
    * `validToCol`, `currentCol`); `updates` = the same attribute columns +
    * `versionCol` (a monotone change version — event time, batch id).
    * Result, per key:
    *   - brand-new key → inserted current row (validFrom = version,
    *     validTo = null, current = true);
    *   - matched key → the current base row closes (validTo = version,
    *     current = false) and the update inserts as the new current row;
    *   - untouched keys and all HISTORY rows pass through byte-identical.
    *
    * Edge semantics beyond [[upsert]]'s (null keys rejected, duplicate
    * keys resolved by `orderCol` or rejected): a version that does NOT
    * advance past the matched current row's validFrom would corrupt the
    * effective-date chain (overlapping validity) — rejected with a
    * distributed assert. Intra-batch history stacking (two versions of
    * one key in one batch) is deliberately out of scope: run one merge
    * per version wave; `orderCol` keeps only the latest.
    *
    * Scale shape: ONE pass over the base — a single left join against the
    * skinny winner keys (AQE broadcasts it) drives both the close and the
    * pass-through, then the insert rows union on. The base never
    * shuffles.
    */
  def upsertScd2(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                 versionCol: String, orderCol: Option[String] = None,
                 validFromCol: String = "valid_from",
                 validToCol: String = "valid_to",
                 currentCol: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty, "upsertScd2 needs at least one key column")
    val dating = Seq(validFromCol, validToCol, currentCol)
    require(dating.forall(base.columns.contains),
      s"base must carry the effective-dating columns ${dating.mkString(", ")}")
    require(updates.columns.contains(versionCol),
      s"updates must carry the version column $versionCol")
    require(!dating.contains(versionCol),
      "versionCol must be distinct from the effective-dating columns")
    require(base.columns.toSet -- dating ==
      updates.columns.toSet - versionCol,
      "updates must carry exactly the base's attribute columns + the version")
    val winners = mergeWinners(updates, keyCols, orderCol, "upsertScd2")
    val wk = winners.select(keyCols.map(col) :+ col(versionCol).as("__newv"): _*)

    val matchedCurrent = col(currentCol) && col("__newv").isNotNull
    val adjusted = base.join(wk, keyCols, "left")
      .filter(coalesce(
        assert_true(!matchedCurrent || col("__newv") > col(validFromCol),
          concat_ws("", lit("upsertScd2: version must advance past the "),
            lit("current row's "), lit(validFromCol),
            lit(" — an equal/older version would overlap validity"))),
        lit(true)))
      .withColumn(validToCol,
        when(matchedCurrent, col("__newv").cast(base.schema(validToCol).dataType))
          .otherwise(col(validToCol)))
      .withColumn(currentCol, when(matchedCurrent, lit(false)).otherwise(col(currentCol)))
      .drop("__newv")
    val inserts = winners
      .withColumn(validFromCol,
        col(versionCol).cast(base.schema(validFromCol).dataType))
      .withColumn(validToCol, lit(null).cast(base.schema(validToCol).dataType))
      .withColumn(currentCol, lit(true))
      .drop(versionCol)
    adjusted.unionByName(inserts)
  }

  /** Morton (Z-order) code over pre-binned dimension columns: interleaves
    * the low `bits` bits of each column (column j contributes bit i to
    * result position i·k+j), so rows close in EVERY dimension get close
    * z-values. Clustering a table by z-value gives each parquet file a
    * tight min/max envelope on ALL the binned columns at once — scans
    * filtering on any subset of them prune files, where a plain sort
    * only serves its leading column. Pure bit arithmetic on codegen
    * built-ins (shift/and/or), zero shuffles, exactly replayable in any
    * engine with integer bit ops (q98's oracle).
    *
    * Inputs must already be binned to [0, 2^bits) (integer-typed; higher
    * bits are masked off here so out-of-range values wrap rather than
    * corrupt neighbors' positions). [[rangeBin]] bins a numeric column.
    */
  def zorderValue(binCols: Seq[Column], bits: Int): Column = {
    val k = binCols.size
    require(k >= 1, "zorderValue needs at least one dimension")
    require(bits >= 1 && bits * k <= 63,
      s"bits x dimensions must fit a long, got $bits x $k")
    val terms = for {
      (c, j) <- binCols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Bin a numeric column to [0, 2^bits) over a fixed [lo, hi) range
    * (clamped at the edges) — the binning companion of [[zorderValue]].
    */
  def rangeBin(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "rangeBin needs hi > lo")
    val n = 1L << bits
    least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble))
        .cast("long")))
  }

  /** Cluster a table by Z-order for a multi-dimension-prunable layout:
    * range-repartition on the z-value (each output partition owns a
    * contiguous z-range → a compact region of the dimension space), sort
    * within partitions, drop the helper column. Write the result
    * partitioned/bucketed as usual; min/max file stats then prune scans
    * on ANY binned dimension. One range shuffle, same cost as a global
    * sort by one column.
    */
  def clusterByZOrder(df: DataFrame, binCols: Seq[Column], bits: Int,
                      numPartitions: Int): DataFrame = {
    val z = "__zorder"
    df.withColumn(z, zorderValue(binCols, bits))
      .repartitionByRange(numPartitions, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Snapshot diff — change-data-capture between two FULL snapshots of a
    * keyed table (the batch-world substitute for a table format's change
    * feed): classifies every key as `insert` (new only), `delete` (old
    * only), `update` (both, payload differs null-safely) or `unchanged`.
    * Output carries the key columns, the surviving payload (new side for
    * insert/update, old side for delete — a field that legitimately became
    * NULL in the new snapshot stays NULL), and `changeCol`.
    *
    * Shape: union-tag-aggregate, ONE shuffle of old ∪ new on the key —
    * the full-outer-join formulation shuffles both sides separately and
    * then needs a second pass for duplicate detection. Here key
    * uniqueness per snapshot (without which a diff is meaningless — a
    * duplicate key would silently cross-multiply in a join) is enforced
    * FREE inside the same aggregate via a distributed assert. NULL key
    * components group together (GROUP BY null semantics) rather than
    * silently producing delete+insert pairs — note a FULL JOIN spelling
    * (like q95's oracle, whose keys are never null) differs there.
    *
    * Payload columns may be any Spark type (compared as a struct with
    * null-safe `<=>`; carried via `first` over the ≤1 row per side).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
                   includeUnchanged: Boolean = false,
                   changeCol: String = "change_type"): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldSnap.columns.toSet == newSnap.columns.toSet,
      s"snapshots must share a column set; old-only=${
        (oldSnap.columns.toSet -- newSnap.columns).mkString(",")} new-only=${
        (newSnap.columns.toSet -- oldSnap.columns).mkString(",")}")
    val payloadCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(payloadCols.nonEmpty, "snapshots need at least one non-key column")
    def tagged(side: String, df: DataFrame): DataFrame =
      df.select(keyCols.map(col) :+ lit(side).as("__side") :+
        struct(payloadCols.map(col): _*).as("__p"): _*)
    val agg = tagged("o", oldSnap).unionByName(tagged("n", newSnap))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(when(col("__side") === "o", 1)).as("__no"),
        count(when(col("__side") === "n", 1)).as("__nn"),
        first(when(col("__side") === "o", col("__p")), ignoreNulls = true).as("__po"),
        first(when(col("__side") === "n", col("__p")), ignoreNulls = true).as("__pn"))
      .filter(coalesce(
        assert_true(col("__no") <= 1 && col("__nn") <= 1, concat_ws("",
          lit("snapshotDiff: duplicate key ("),
          concat_ws(", ", keyCols.map(col): _*),
          lit(") within a snapshot — a diff needs unique keys per side"))),
        lit(true)))
    val typed = agg.withColumn(changeCol,
      when(col("__no") === 0, lit("insert"))
        .when(col("__nn") === 0, lit("delete"))
        .when(!(col("__po") <=> col("__pn")), lit("update"))
        .otherwise(lit("unchanged")))
    val kept =
      if (includeUnchanged) typed else typed.filter(col(changeCol) =!= "unchanged")
    kept.select(keyCols.map(col) ++
      payloadCols.map(c =>
        when(col("__pn").isNotNull, col(s"__pn.$c"))
          .otherwise(col(s"__po.$c")).as(c)) :+
      col(changeCol): _*)
  }

  /** SCD Type-2 history maintenance (Kimball's slowly-changing
    * dimension): fold a new full snapshot into a versioned history
    * table. History rows carry `(eff_from, eff_to, is_current)` —
    * `eff_to` NULL while current. At apply time `effAt`:
    *
    *   - changed keys: the current version CLOSES (eff_to = effAt) and
    *     a new current version opens (eff_from = effAt)
    *   - new keys: a first current version opens
    *   - keys absent from the snapshot: the current version closes
    *     (the hard-delete-as-history convention)
    *   - unchanged keys: untouched
    *
    * Classification rides [[snapshotDiff]] (one shuffle of the
    * current-slice ∪ snapshot union, result sized by churn); the
    * closed/stay split joins the churn keys back. Churn is usually tiny
    * but is NOT bounded by construction (a snapshot-wide payload change
    * makes it the size of the dimension), so the strategy is left to AQE:
    * a small churn frame broadcasts at runtime, a dimension-sized one
    * shuffles instead of blowing the broadcast limit. Historical
    * (non-current) rows pass through untouched, so repeated applies
    * build the full version chain.
    *
    * @param history columns = keys ++ payload ++ eff_from, eff_to,
    *                is_current
    * @param snapshot columns = keys ++ payload
    */
  def scd2Apply(history: DataFrame, snapshot: DataFrame,
                keyCols: Seq[String], effAt: Long): DataFrame = {
    val meta = Seq("eff_from", "eff_to", "is_current")
    require(meta.forall(history.columns.contains),
      s"history must carry ${meta.mkString(", ")}")
    val curr = history.filter(col("is_current"))
    val past = history.filter(!col("is_current"))
    val slice = curr.drop(meta: _*)
    val diff = snapshotDiff(slice, snapshot, keyCols)
    val payloadCols = slice.columns.filterNot(keyCols.contains).toSeq
    val churnKeys = diff
      .filter(col("change_type").isin("update", "delete"))
      .select(keyCols.map(col): _*)
    val closed = curr.join(churnKeys, keyCols)
      .withColumn("eff_to", lit(effAt))
      .withColumn("is_current", lit(false))
    val stay = curr.join(churnKeys, keyCols, "left_anti")
    val fresh = diff
      .filter(col("change_type").isin("insert", "update"))
      .select((keyCols ++ payloadCols).map(col): _*)
      .withColumn("eff_from", lit(effAt))
      .withColumn("eff_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    past.unionByName(stay).unionByName(closed).unionByName(fresh)
  }

  /** Contiguous global ids 0..n-1 in sort-key order WITHOUT the global-sort
    * bottleneck: a `row_number() OVER (ORDER BY …)` window funnels 100 TB
    * through ONE task; this instead range-repartitions (each partition owns
    * a disjoint key range), sorts locally, and lets zipWithIndex assign
    * offsets — one lightweight count job (per-partition counts to the
    * driver, a few longs) plus one map pass. For UNIQUE sort keys the
    * assignment is identical to the single-task window on any cluster
    * layout, because the global order is fully determined by the keys.
    */
  def contiguousIds(df: DataFrame, sortCols: Seq[String],
                    numPartitions: Int, idName: String = "global_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val arranged = df
      .repartitionByRange(numPartitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = arranged.schema.add(idName, LongType, nullable = false)
    val withId = arranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    arranged.sparkSession.createDataFrame(withId, schema)
  }

  /** Quantile buckets 1..nBuckets in sort-key order WITHOUT the global-sort
    * bottleneck: `ntile(n) OVER (ORDER BY …)` funnels the whole input
    * through ONE task (an empty-frame window is a single partition); this
    * instead range-repartitions (each partition owns a disjoint key range),
    * sorts locally, derives per-partition rank offsets from one lightweight
    * count job (a few longs to the driver — the [[contiguousIds]] recipe),
    * and maps each global rank to its NTILE bucket with the SQL-standard
    * fill rule (the first `n mod nBuckets` buckets get the extra row). For
    * UNIQUE sort keys the assignment is identical to the single-task window
    * on any cluster layout, because the global order is fully determined by
    * the keys.
    */
  def rankBuckets(df: DataFrame, orderCols: Seq[String], nBuckets: Int,
                  numPartitions: Int,
                  bucketName: String = "bucket"): DataFrame = {
    require(nBuckets > 0, s"rankBuckets: nBuckets must be > 0, got $nBuckets")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    // eager localCheckpoint: the arranged frame feeds TWO rdd passes
    // (count + bucket map) — without it the whole upstream plan (which
    // may carry expensive joins) recomputes per pass
    val arranged = df
      .repartitionByRange(numPartitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint(true)
    val rdd = arranged.rdd
    // one count pass: per-partition sizes → rank offsets AND the total,
    // so the bucket map needs no second aggregate over the data
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    // NTILE fill rule over 0-based rank r: with q = total/n, rem = total%n,
    // the first rem buckets hold q+1 rows, the rest q. q == 0 (more buckets
    // than rows) degenerates to bucket = r+1 via the first branch, because
    // rem == total there.
    val q = total / nBuckets
    val rem = total % nBuckets
    val schema = arranged.schema.add(bucketName, LongType, nullable = false)
    val withB = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets(pid)
      it.map { row =>
        val b =
          if (r < rem * (q + 1)) r / (q + 1) + 1
          else rem + (r - rem * (q + 1)) / q + 1
        r += 1
        Row.fromSeq(row.toSeq :+ b)
      }
    }
    arranged.sparkSession.createDataFrame(withB, schema)
  }

  /** EXACT order-statistic quantiles without a global sort and without
    * the single-reducer `percentile` aggregate (which collects every
    * group value into one task — the 100 TB melt): quantile `q` is the
    * value at 0-based rank `floor(q·(n−1))` in value order (the
    * discrete "lower" quantile — no interpolation, so the answer is an
    * actual data value and replays exactly in any engine). Plan: range-
    * repartition on the value (each partition owns a disjoint value
    * range), local sort, ONE per-partition count job (a few longs to the
    * driver — the [[rankBuckets]] recipe), then a second pass extracts
    * only the rows whose global rank is a target — |qs| values cross the
    * driver, never the data.
    *
    * NULLs are excluded (the SQL aggregate convention).
    *
    * @return (q, value) — one row per requested quantile, value keeps
    *         the column's own type; empty input → empty result
    */
  /** Exact weighted quantile per group (type-1 / lower: the smallest
    * value whose cumulative weight reaches q·W) with the threshold as a
    * CROSS-MULTIPLIED integer comparison — den·cum ≥ num·W for
    * q = num/den — so no float boundary can flip a verdict and any
    * engine replays it exactly. The workhorse is the weighted MEDIAN
    * (num=1, den=2): "half the TOKENS sit in docs shorter than this",
    * which the unweighted median misstates whenever length and weight
    * correlate (they always do).
    *
    * CONTRACT: weights are INTEGRAL COUNTS (tokens, rows, bytes). The
    * exact cross-multiplied threshold only holds over integer weights,
    * so `weightCol` must already be an integral type — a fractional
    * weight column is rejected loudly (it used to truncate silently,
    * dropping w<1 rows and skewing the quantile). Scale fractional
    * weights to a fixed-point integer upstream if needed.
    *
    * Plan: weights pre-aggregate per (group, value) — ties collapse
    * before the window, so the running sum is over distinct values —
    * then one group-partitioned cumsum and a min over qualifying
    * values. Two shuffles, both keyed by group.
    *
    * → (groupCols…, wq_value, total_w)
    */
  def weightedQuantile(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, weightCol: String,
                       qNum: Long = 1L, qDen: Long = 2L): DataFrame = {
    require(qNum >= 0 && qDen > 0 && qNum <= qDen,
      s"quantile must be a rational in [0,1]: $qNum/$qDen")
    df.schema(weightCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"weightedQuantile requires an integral weight column; " +
          s"'$weightCol' is $other — scale fractional weights to " +
          "fixed-point integers upstream")
    }
    val W = org.apache.spark.sql.expressions.Window
    val byVal = df
      .select(groupCols.map(col) :+ col(valueCol).as("__v") :+
        col(weightCol).cast("long").as("__w"): _*)
      .filter(col("__v").isNotNull && col("__w").isNotNull &&
        col("__w") > 0)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__w")).as("__wv"))
    val wRun = W.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.partitionBy(groupCols.map(col): _*)
    byVal
      .withColumn("__cum", sum(col("__wv")).over(wRun))
      .withColumn("__tot", sum(col("__wv")).over(wAll))
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("__v")).as("wq_value"), min(col("__tot")).as("total_w"))
  }

  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                     numPartitions: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1], got $qs")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val vals = df.select(col(valueCol)).filter(col(valueCol).isNotNull)
    // eager localCheckpoint: two rdd passes (count + rank extraction),
    // same rationale as [[rankBuckets]]
    val arranged = vals.repartitionByRange(numPartitions, col(valueCol))
      .sortWithinPartitions(valueCol)
      .localCheckpoint(true)
    val rdd = arranged.rdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val outSchema = StructType(Seq(
      StructField("q", DoubleType, nullable = false),
      arranged.schema.head.copy(name = "value")))
    if (total == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    // target global ranks; both engines floor the same IEEE product
    val targets = qs.map(q => q -> math.floor(q * (total - 1)).toLong)
    val hits = rdd.mapPartitionsWithIndex { (pid, it) =>
      val lo = offsets(pid)
      val hi = offsets(pid) + counts(pid)
      val mine = targets.filter { case (_, r) => r >= lo && r < hi }
        .sortBy(_._2)
      if (mine.isEmpty) Iterator.empty
      else {
        var rank = lo
        var pending = mine
        val out = Seq.newBuilder[Row]
        while (pending.nonEmpty && it.hasNext) {
          val row = it.next()
          while (pending.nonEmpty && pending.head._2 == rank) {
            out += Row(pending.head._1, row.get(0))
            pending = pending.tail
          }
          rank += 1
        }
        out.result().iterator
      }
    }.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(hits.toSeq, 1), outSchema)
  }
}
