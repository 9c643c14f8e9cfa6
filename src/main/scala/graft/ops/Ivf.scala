package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the learned-centroid
  * counterpart of the random-hyperplane LSH in [[Similarity]].
  *
  * Index build = distributed k-means over the embedding column, entirely in
  * DataFrame operations: assignment is a per-row argmax over centroid dot
  * products (a native codegen'd loop over the centroid matrix, carried as
  * ONE plan reference object — see [[graft.functions.NearestCentroidId]];
  * plan/codegen size is O(1) in k, so k scales into the 1e4–1e6 range
  * instead of the few hundred the old k-branch greatest(struct) unroll
  * allowed) and the centroid update is a posexplode + groupBy(cid, dim)
  * mean. Only the k×dim centroid matrix ever reaches the driver — corpus
  * vectors never move. Search probes the `nProbe` nearest inverted lists,
  * so the join shuffles on centroid id instead of forming the cross
  * product.
  *
  * Determinism: centroid init picks the k corpus vectors with the smallest
  * mixed id hash (a seeded deterministic sample), so the index is
  * reproducible across runs and partitionings.
  */
object Ivf {

  /** The centroid matrix as ONE array<array<double>> literal, row index =
    * centroid id (build/load keep ids contiguous; enforced here because the
    * native expressions return ROW indexes as ids).
    */
  private def centroidMatrix(centroids: Array[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.iterator.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "centroid ids must be contiguous 0..k-1")
    typedLit(sorted.map(_._2.toSeq).toSeq)
  }

  /** argmax over centroids of dot(unit vec, unit centroid) — native loop
    * expression, plan size independent of k.
    */
  private def nearestCentroid(vn: Column, centroids: Array[(Int, Array[Double])]): Column =
    graft.functions.ArrayMath.nearestCentroidId(vn, centroidMatrix(centroids))

  /** Graft's native kernels resolve through the session function registry
    * (Spark 4 has no public Column-from-Expression constructor), so every
    * index entry point self-registers — idempotent, and it keeps e.g. a
    * loadIndex → saveIndex(quantize = true) round-trip working on a
    * session built without GraftExtensions.
    */
  private def ensureFns(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.ArrayMath.register(spark)

  private def unitVectors(df: DataFrame, vecCol: String): DataFrame = {
    ensureFns(df.sparkSession)
    val vd = transform(col(vecCol), x => x.cast("double"))
    df.withColumn("__vd", vd)
      .withColumn("__norm", sqrt(Similarity.dot(col("__vd"), col("__vd"))))
      .withColumn("__vn", transform(col("__vd"), x => x / col("__norm")))
      .drop("__vd", "__norm")
  }

  /** Spherical k-means on the unit sphere. Returns (cid, centroid) with
    * centroids L2-normalized.
    *
    * Driver-traffic contract: each Lloyd iteration collects exactly the
    * k×dim centroid-sum matrix (plus the initial k seed vectors) — total
    * ≈ iters·k·dim·24 bytes. With the √N sizing rule ([[ivfPolicy]]) k
    * grows with corpus size, so `maxTrainRows` caps the TRAINING corpus by
    * a deterministic hash-sample (k-means quality depends on the sample's
    * distribution, not the full corpus — standard IVF practice; FAISS
    * trains on bounded samples the same way). The cap bounds both the
    * per-iteration scan and, via ivfPolicy(sample size), the k×dim driver
    * matrix, regardless of corpus scale. `maxTrainRows <= 0` trains on
    * everything.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 3, seed: Long = 42L,
                     maxTrainRows: Long = 100000L): Array[(Int, Array[Double])] = {
    // iterative algorithm: cache the normalized vectors once instead of
    // recomputing scan+normalize every Lloyd iteration
    val unit = trainSample(
      unitVectors(corpus, vecCol).select(col(idCol), col("__vn")), idCol,
      effectiveTrainRows(maxTrainRows, k), seed).persist()
    try trainOnUnit(unit, idCol, k, iters, seed)
    finally { unit.unpersist(false); () }
  }

  /** Training-sample floor: k-means needs ≳30 rows per centroid (the FAISS
    * clustering warning threshold) or centroids train on noise. The cap the
    * caller asked for is silently raised to 30·k so `ivfPolicy`'s large k
    * can never under-train; `maxTrainRows <= 0` still means "train on
    * everything".
    */
  private[graft] def effectiveTrainRows(maxTrainRows: Long, k: Int): Long =
    if (maxTrainRows <= 0) 0L else math.max(maxTrainRows, 30L * k)

  /** Deterministic ≳`maxTrainRows`-row training sample: keep rows whose
    * seeded id hash is ≡ 0 mod ⌊n/max⌋. One count() (cheap metadata-ish
    * scan) decides the rate. FLOORING the denominator keeps the
    * expectation in [max, 2·max): never below the 30·k training floor
    * (the old ⌈n/max⌉ form undershot it by up to 2× when max < n < 2·max),
    * at most 2× the requested cap — a bounded cost overshoot, exact again
    * as n/max grows. No granularity floor or overflow at any n.
    */
  private[graft] def trainSample(unit: DataFrame, idCol: String,
                                 maxTrainRows: Long, seed: Long): DataFrame = {
    if (maxTrainRows <= 0) return unit
    val n = unit.count()
    if (n <= maxTrainRows) unit
    else {
      val denom = math.max(1L, n / maxTrainRows)
      unit.filter(pmod(xxhash64(lit(seed + 1), col(idCol)), lit(denom)) === 0L)
    }
  }

  private def trainOnUnit(unit: DataFrame, idCol: String, k: Int, iters: Int,
                          seed: Long): Array[(Int, Array[Double])] = {
    // deterministic seeded sample: k smallest mixed-id hashes
    var centroids: Array[(Int, Array[Double])] = unit
      .withColumn("__r", xxhash64(lit(seed), col(idCol)))
      .orderBy(col("__r"))
      .limit(k)
      .select(col("__vn"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }

    (1 to iters).foreach { _ =>
      val assigned = unit.withColumn("__cid", nearestCentroid(col("__vn"), centroids))
      val sums = assigned
        .select(col("__cid"), posexplode(col("__vn")))
        .groupBy(col("__cid"), col("pos"))
        .agg(sum(col("col")).as("s"))
        .collect() // k × dim rows — centroid-matrix sized, not corpus sized
      val byCid = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case None => (cid, old) // empty cluster keeps its centroid
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val v = new Array[Double](dim)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(v.map(x => x * x).sum)
            (cid, if (n == 0.0) old else v.map(_ / n))
        }
      }
    }
    centroids
  }

  /** Corpus-size-derived IVF parameters (nCentroids, nProbe) — replaces
    * fixture-tuned constants.
    *
    * Derivation: with k lists, per-row assignment costs O(k·dim) and each
    * probed list holds ≈ N/k vectors, so total search work per query is
    * k·dim + nProbe·(N/k)·dim; k = √N equalizes the two terms and both
    * grow as √N — the classical IVF sizing (same rule FAISS documents for
    * IndexIVFFlat). nProbe: on clustered (real) embedding corpora near
    * neighbors concentrate in a few lists, so a constant probe fraction
    * (k/8, ≥ 2) recovers high recall; on STRUCTURELESS corpora (uniform
    * random — the fixture, and the ANN worst case) recall can be no better
    * than scan coverage nProbe/k, so `structureless = true` probes
    * ⌈targetRecall·k⌉ lists. Fixture queries use the structureless mode;
    * real 100 TB corpora should not.
    */
  def ivfPolicy(corpusSize: Long, targetRecall: Double = 0.9,
                structureless: Boolean = false): (Int, Int) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0, "targetRecall must be in (0, 1]")
    val n = math.max(1L, corpusSize).toDouble
    val k = math.min(65536, math.max(4, math.round(math.sqrt(n)).toInt))
    val probe =
      if (structureless) math.min(k, math.ceil(targetRecall * k).toInt)
      else math.min(k, math.max(2, k / 8))
    (k, probe)
  }

  /** A built IVF index: the trained centroid matrix plus the corpus with
    * its list assignment (`idCol`, `__vn` unit vector, `__cid` list id).
    * Build once, search many — training never reruns per query batch.
    */
  final case class IvfIndex(idCol: String,
                            centroids: Array[(Int, Array[Double])],
                            assigned: DataFrame)

  /** Train centroids and assign every corpus vector to its inverted list.
    * `maxTrainRows` bounds the k-means training corpus (see
    * [[trainCentroids]] for the driver-traffic contract); assignment (and
    * search) always covers the FULL corpus — only training is sampled.
    *
    * Sizing at large k: now that assignment cost is a native loop (no plan
    * ceiling), k follows [[ivfPolicy]]'s √N rule into the 1e4–1e6 range;
    * keep `maxTrainRows` ≳ 30·k so each centroid trains on a meaningful
    * sample (the default 1e5 is right for k ≲ 3000).
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nCentroids: Int = 16, iters: Int = 3, seed: Long = 42L,
                 maxTrainRows: Long = 100000L): IvfIndex = {
    // the cache exists only for the training iterations (each Lloyd step
    // re-reads the normalized vectors); it is released as soon as the
    // centroid matrix is on the driver, so repeated builds leave no
    // lingering storage. The assignment plan recomputes normalization
    // inside its single corpus scan — one cheap projection, no second pass.
    val cached = trainSample(
      unitVectors(corpus, vecCol).select(col(idCol), col("__vn")), idCol,
      effectiveTrainRows(maxTrainRows, nCentroids), seed).persist()
    val centroids =
      try trainOnUnit(cached, idCol, nCentroids, iters, seed)
      finally { cached.unpersist(false); () }
    val assigned = unitVectors(corpus, vecCol)
      .select(col(idCol), col("__vn"),
        nearestCentroid(col("__vn"), centroids).as("__cid"))
    IvfIndex(idCol, centroids, assigned)
  }

  /** Persist an index: inverted lists as parquet PARTITIONED BY list id —
    * a probe that touches nProbe lists prunes to nProbe directories (and
    * the probe join is a broadcast, so dynamic partition pruning applies) —
    * plus the k×dim centroid matrix alongside. The 100 TB serving layout:
    * search I/O is proportional to the lists probed, not the corpus.
    *
    * With `quantize = true` the lists hold symmetric-int8 codes plus one
    * double scale per vector ([[Quantize]]) instead of the unit double
    * array — ~8× fewer list bytes, so per-probe serving I/O drops by the
    * same factor — and a `refine/` sidecar keeps the full-precision unit
    * vectors (same `__cid` partitioning), which [[searchIndexQuantized]]
    * reads ONLY for the re-rank candidate rows (the FAISS IVF + refine
    * index shape).
    */
  def saveIndex(index: IvfIndex, path: String, quantize: Boolean = false): Unit = {
    ensureFns(index.assigned.sparkSession)
    // cluster each list into one task before the partitioned write:
    // without this every task holds rows of ~every list and the store
    // becomes tasks×k tiny files — the classic partitionBy small-file
    // trap that breaks file listing long before 100 TB. (At extreme
    // per-list sizes, follow with compaction/AQE-sized rewrites.)
    val assigned = index.assigned.repartition(col("__cid"))
    if (quantize) {
      // two write actions over one assignment: persist so the corpus scan
      // + O(k·dim) argmax run once, and so lists/ and refine/ can never
      // diverge under a nondeterministic upstream (a row in one store but
      // not the other would silently vanish from every re-ranked result)
      assigned.persist()
      try {
        assigned
          .withColumn("__q8", Quantize.int8Stats(col("__vn")))
          .select(col(index.idCol), col("__q8.scale").as("__scale"),
            col("__q8.codes").as("__code"), col("__cid"))
          .write.mode("overwrite").partitionBy("__cid").parquet(path + "/lists")
        assigned.write.mode("overwrite").partitionBy("__cid")
          .parquet(path + "/refine")
      } finally { assigned.unpersist(false); () }
    } else {
      assigned.write.mode("overwrite").partitionBy("__cid")
        .parquet(path + "/lists")
    }
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
  }

  /** True when `path` holds a `saveIndex(quantize = true)` layout (int8
    * lists + refine sidecar). One lists-schema read.
    */
  def isQuantized(spark: org.apache.spark.sql.SparkSession, path: String): Boolean =
    !spark.read.parquet(path + "/lists").columns.contains("__vn")

  /** Loads either layout. For a quantized index the full-precision vectors
    * come from the `refine/` sidecar, so [[searchIndex]] over the loaded
    * index is exact — use [[searchIndexQuantized]] to serve from the int8
    * lists instead.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                idCol: String): IvfIndex = {
    val centroids = spark.read.parquet(path + "/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val lists = spark.read.parquet(path + "/lists")
    val assigned =
      if (lists.columns.contains("__vn")) lists
      else spark.read.parquet(path + "/refine")
    // deleted ids are dead from the moment of deleteFromIndex — the
    // loaded view, and every search/stat/rebuild over it, excludes them
    IvfIndex(idCol, centroids, excludeTombstoned(spark, path, idCol, assigned))
  }

  /** Incremental maintenance (in-memory flavor): assign a new batch to an
    * EXISTING index's centroids — no retraining, no touch of the already-
    * assigned corpus. The batch pays one scan + the argmax projection;
    * search over the result sees vectors from every wave.
    *
    * Centroids are deliberately frozen: retraining would reassign the whole
    * corpus (a full rebuild). The price is drift — if the incoming
    * distribution shifts, new vectors crowd into few lists and probe cost
    * rises. Rebuild policy: when [[indexStats]]' skew (max-list /
    * median-list) exceeds ~8, rebuild with [[buildIndex]].
    */
  def assignToExisting(index: IvfIndex, batch: DataFrame, vecCol: String): IvfIndex = {
    val assigned = unitVectors(batch, vecCol)
      .select(col(index.idCol), col("__vn"),
        nearestCentroid(col("__vn"), index.centroids).as("__cid"))
    index.copy(assigned = index.assigned.unionByName(assigned))
  }

  /** Incremental maintenance (persisted flavor): append a batch into a
    * [[saveIndex]] layout. Assignment runs against the SAVED centroid
    * matrix; the new list rows land in their `__cid=` partitions as
    * appended files — existing files are never rewritten, so concurrent
    * probes stay correct (parquet append is add-only). Cost is O(|batch|),
    * independent of how much the index already holds. Same drift contract
    * as [[assignToExisting]].
    */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    batch: DataFrame, idCol: String, vecCol: String,
                    dedupeIds: Boolean = false): Long =
    appendToIndexTracked(spark, path, batch, idCol, vecCol, dedupeIds,
      trackCids = false)._1

  /** [[appendToIndex]] that ALSO reports which lists the batch touched
    * (distinct `__cid`s — ≤ k ints, usually ≪ k for a micro-batch): the
    * streaming sink hands them to [[compactIndex]] so per-wave
    * maintenance lists only the wave's own lists instead of all k
    * (thousands of directory listings per wave on an object store,
    * for nothing, when the index is healthy). `trackCids = false` skips
    * the extra distinct-collect job entirely.
    */
  private[graft] def appendToIndexTracked(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, vecCol: String,
      dedupeIds: Boolean = false, trackCids: Boolean = true): (Long, Seq[Int]) = {
    val index = loadIndex(spark, path, idCol)
    val assigned = unitVectors(batch, vecCol)
      .select(col(idCol), col("__vn"),
        nearestCentroid(col("__vn"), index.centroids).as("__cid"))
      .repartition(col("__cid")) // one appended file per touched list, not per task
    // appends must match the saved layout: an int8 index gets codes in
    // lists/ plus full vectors in refine/; a PQ index gets m-byte codes
    // RE-ENCODED through its saved codebooks; mixing schemas within
    // lists/ would break every later probe scan.
    // same persist rationale as saveIndex: one batch scan feeds the cid
    // probe / anti-joins / counts / every directory write
    assigned.persist()
    try {
      // id-level idempotence for replayed appends (the streaming sink's
      // torn-replay window): anti-join ONLY against the lists the batch's
      // vectors hash into — `__cid` is a partition column, so the probe
      // scan prunes to touched lists, cost ∝ batch not index (the
      // dedupAppendSink bucket shape with cids as buckets). Two-directory
      // layouts dedupe PER DIRECTORY: a crash between the two appends
      // leaves them divergent, and a single shared anti-join would make
      // the replay skip BOTH (orphaning the crashed dir forever) — per-dir
      // anti-joins re-append exactly the missing rows so both converge.
      // the batch's cid set is the same for every directory — collect it
      // once and share it across the lists/ and refine/ anti-joins (lazy:
      // the non-dedupe path never pays the job); the PER-DIRECTORY
      // anti-join below must stay separate, per the divergence note above
      lazy val cidsHit: Seq[Int] = assigned.select(col("__cid")).distinct()
        .collect().map(_.getInt(0)).toSeq // ≤ k ints — bounded by design
      def freshFor(dir: String): DataFrame =
        if (!dedupeIds) assigned
        else {
          val existing = spark.read.parquet(path + "/" + dir)
            .where(col("__cid").isin(cidsHit: _*))
            .select(col(idCol).as("__existing_id"))
          assigned.join(existing,
            assigned(idCol) === col("__existing_id"), "left_anti")
        }
      def write(df: DataFrame, dir: String): Long = {
        df.persist()
        try {
          val n = df.count()
          if (n > 0) df.write.mode("append").partitionBy("__cid")
            .parquet(path + "/" + dir)
          n
        } finally { df.unpersist(false); () }
      }
      val n = if (isPq(spark, path)) {
        val books = spark.read.parquet(path + "/pq")
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
          .groupBy(_._1).toArray.sortBy(_._1)
          .map(_._2.sortBy(_._2).map(_._3))
        val n0 = write(freshFor("lists")
          .withColumn("__pq", graft.functions.ArrayMath.pqEncode(
            col("__vn"), codebooksLit(books)))
          .select(col(idCol), col("__pq"), col("__cid")), "lists")
        write(freshFor("refine"), "refine")
        n0
      } else if (isQuantized(spark, path)) {
        val n0 = write(freshFor("lists")
          .withColumn("__q8", Quantize.int8Stats(col("__vn")))
          .select(col(idCol), col("__q8.scale").as("__scale"),
            col("__q8.codes").as("__code"), col("__cid")), "lists")
        write(freshFor("refine"), "refine")
        n0
      } else {
        write(freshFor("lists"), "lists")
      }
      (n, if (trackCids) cidsHit else Nil)
    } finally { assigned.unpersist(false); () }
  }

  /** Offline small-file compaction for a [[saveIndex]]/[[saveIndexPq]]
    * layout — the maintenance middle tier between per-wave
    * [[appendToIndex]] and a full [[rebuildIndex]]: every micro-batch
    * leaves one appended file per touched list, so after N waves a hot
    * list holds N small files and probe scans pay file-listing and
    * footer overhead per file (the classic small-file scale-killer —
    * the partition pruning the layout exists for still works, but each
    * pruned-in list costs N opens instead of 1). Rewrites ONLY the
    * lists whose data-file count exceeds `maxFilesPerList` — in
    * `lists/` and, for quantized/PQ layouts, `refine/`, each judged
    * independently — down to ceil(bytes / targetFileBytes) right-sized
    * files (1 for small lists; a genuinely large list keeps multiple
    * full-size files even if that exceeds `maxFilesPerList`).
    *
    * Rows are unchanged — pure file-count reduction: search results are
    * identical before/after, and append idempotence (the dedupeIds
    * anti-join) is unaffected because ids and partition values do not
    * move. OFFLINE op (run without concurrent writers, like
    * [[graft.streaming.StreamingIngest.compactDedupTarget]]). The
    * per-list swap is marker-fenced: old list parked under an
    * underscore-prefixed dir (invisible to partition discovery), new
    * files lifted in, park deleted — and ON ENTRY a crashed earlier
    * attempt is rolled forward/back first (parked dir restored when the
    * live dir is missing, orphaned tmp/park debris removed), so the
    * recovery action is simply running the op again. Returns the number
    * of (directory, list) pairs compacted.
    *
    * `onlyCids` restricts the sweep to the named lists (null = all): the
    * streaming sink passes each wave's touched `__cid`s so per-wave
    * maintenance pays O(batch) directory listings, not O(k) — only the
    * lists a wave appended to can have newly crossed the threshold.
    * Crash recovery always scans the whole directory (debris from a
    * crashed attempt may sit in lists outside this wave's set).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   maxFilesPerList: Int = 16,
                   targetFileBytes: Long = 128L * 1024 * 1024,
                   onlyCids: Seq[Int] = null): Int = {
    require(maxFilesPerList >= 1, "maxFilesPerList must be >= 1")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    Seq("lists", "refine").map { dir =>
      compactDir(spark, fs, new org.apache.hadoop.fs.Path(root, dir),
        maxFilesPerList, targetFileBytes,
        if (onlyCids == null) null else onlyCids.toSet)
    }.sum
  }

  private def compactDir(spark: org.apache.spark.sql.SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         dirPath: org.apache.hadoop.fs.Path,
                         maxFilesPerList: Int, targetFileBytes: Long,
                         onlyCids: Set[Int]): Int = {
    import org.apache.hadoop.fs.Path
    if (!fs.exists(dirPath)) return 0
    // recovery from a crashed earlier attempt (shared protocol)
    recoverSwapDebris(fs, dirPath)
    var compacted = 0
    fs.globStatus(new Path(dirPath, "__cid=*")).filter { d =>
      d.isDirectory && (onlyCids == null ||
        d.getPath.getName.stripPrefix("__cid=").toIntOption.exists(onlyCids))
    }.foreach { d =>
      val dataFiles = fs.listStatus(d.getPath).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (dataFiles.length > maxFilesPerList) {
        val totalBytes = dataFiles.map(_.getLen).sum
        val want = math.max(1L,
          (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
        // rewrite this list's rows (files hold no partition column)
        swapRewrite(spark, fs, dirPath, d.getPath, numFiles = want)(identity)
        compacted += 1
      }
    }
    compacted
  }

  // -------------------------------------------------------------------
  // Deletion tier: tombstones + purge (the vector-DB delete pattern —
  // FAISS IDSelector / Milvus delete+compact). A delete must be cheap
  // and immediate; rewriting list files per delete would be a full
  // random-write pass over the store. So: deletes append ids to a
  // skinny `tombstones/` plane (O(deleted) bytes), every serving path
  // anti-joins it (broadcast — the tombstone set is tiny next to the
  // lists), and [[purgeDeleted]] folds tombstones into the layout
  // offline, rewriting ONLY the lists that hold deleted rows.

  /** Mark ids deleted. Visible to every subsequent search ([[loadIndex]],
    * [[searchIndexQuantized]], [[searchIndexPq]]) without touching a
    * single list file. A tombstoned id stays dead even if a later
    * [[appendToIndex]] wave re-adds it — run [[purgeDeleted]] first to
    * make an id re-insertable (documented trade: the alternative,
    * timestamped tombstones, puts a version column on every list row).
    */
  def deleteFromIndex(path: String, ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol)).distinct().coalesce(1)
      .write.mode("append").parquet(path + "/tombstones")

  /** The live tombstone set, or None when none exist (layouts predating
    * the plane read with zero overhead — no filter is planned at all).
    */
  private def tombstonesDf(spark: org.apache.spark.sql.SparkSession,
                           path: String, idCol: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path + "/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      })
      Some(spark.read.parquet(p.toString).select(col(idCol)).distinct())
    else None
  }

  /** Anti-join a frame against the tombstone plane (no-op when none). */
  private def excludeTombstoned(spark: org.apache.spark.sql.SparkSession,
                                path: String, idCol: String,
                                df: DataFrame): DataFrame =
    tombstonesDf(spark, path, idCol)
      .map(t => df.join(broadcast(t), Seq(idCol), "left_anti"))
      .getOrElse(df)

  /** Fold tombstones into the persisted layout and clear the plane.
    * OFFLINE (no concurrent writers, the [[compactIndex]] contract).
    * Only the lists that actually HOLD deleted rows are rewritten — one
    * bounded collect of touched `__cid`s (≤ k ints), then a
    * marker-fenced per-list swap in `lists/` and, when present,
    * `refine/` (same crash-recovery protocol as compaction: rerun the
    * op after a crash and it rolls forward). Returns the number of
    * (directory, list) rewrites.
    */
  def purgeDeleted(spark: org.apache.spark.sql.SparkSession, path: String,
                   idCol: String): Int = {
    val tomb0 = tombstonesDf(spark, path, idCol).getOrElse(return 0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = Seq("lists", "refine")
      .map(d => new org.apache.hadoop.fs.Path(root, d))
      .filter(fs.exists)
    // recovery FIRST, before ANY plane is read: a list parked by a
    // crashed earlier swap is invisible to partition discovery, so a
    // touched-set computed before recovery would miss it — its restored
    // rows would then survive the purge and be resurrected when the
    // tombstone plane clears
    dirs.foreach(recoverSwapDebris(fs, _))
    // the tombstone set is read once (persisted) and reused by every
    // per-list rewrite instead of re-scanned per swap job
    val tomb = tomb0.persist()
    try {
      var rewrites = 0
      dirs.foreach { dirPath =>
        // touched cids PER PLANE: after a crash between the lists and
        // refine passes, lists/ is already clean — a lists-derived set
        // would come back empty and leave refine/ unpurged forever
        val touched = spark.read.parquet(dirPath.toString)
          .join(broadcast(tomb), Seq(idCol))
          .select("__cid").distinct().collect().map(_.getInt(0)).toSet
        fs.globStatus(new org.apache.hadoop.fs.Path(dirPath, "__cid=*"))
          .filter(d => d.isDirectory &&
            d.getPath.getName.stripPrefix("__cid=").toIntOption.exists(touched))
          .foreach { d =>
            // keep the list's file sizing: a purge shrinks rows a little,
            // it must not collapse a right-sized big list into one file
            val nFiles = fs.listStatus(d.getPath).count { st =>
              val n = st.getPath.getName
              st.isFile && !n.startsWith("_") && !n.startsWith(".")
            }
            swapRewrite(spark, fs, dirPath, d.getPath,
              numFiles = math.max(1, nFiles))(
              _.join(broadcast(tomb), Seq(idCol), "left_anti"))
            rewrites += 1
          }
      }
      // tombstones clear ONLY after every plane is verifiably purged
      fs.delete(new org.apache.hadoop.fs.Path(path + "/tombstones"), true)
      rewrites
    } finally { tomb.unpersist(false); () }
  }

  /** Roll a crashed swap forward/back: parked list whose live dir
    * vanished is restored, parked debris next to a live dir and stale
    * tmp writes are dropped. Shared by [[purgeDeleted]] and
    * [[compactDir]].
    */
  private def recoverSwapDebris(fs: org.apache.hadoop.fs.FileSystem,
                                dirPath: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    fs.listStatus(dirPath).filter(_.getPath.getName.startsWith("_graft_compact_old_"))
      .foreach { t =>
        val live = new Path(dirPath, t.getPath.getName.stripPrefix("_graft_compact_old_"))
        if (!fs.exists(live))
          require(fs.rename(t.getPath, live), s"recovery rename failed: ${t.getPath}")
        else fs.delete(t.getPath, true)
      }
    fs.listStatus(dirPath).filter(_.getPath.getName.startsWith("_graft_compact_tmp_"))
      .foreach(t => fs.delete(t.getPath, true))
  }

  /** Marker-fenced single-list rewrite: write transform(list) to a tmp
    * dir, park the live dir, lift tmp in, drop the park. Crash at any
    * point is repaired by [[recoverSwapDebris]] on the next op.
    */
  private def swapRewrite(spark: org.apache.spark.sql.SparkSession,
                          fs: org.apache.hadoop.fs.FileSystem,
                          dirPath: org.apache.hadoop.fs.Path,
                          d: org.apache.hadoop.fs.Path,
                          numFiles: Int = 1)(
                          transform: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(dirPath, s"_graft_compact_tmp_${d.getName}")
    val trash = new Path(dirPath, s"_graft_compact_old_${d.getName}")
    transform(spark.read.parquet(d.toString))
      .coalesce(numFiles)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(new Path(tmp, "_SUCCESS"), false)
    require(fs.rename(d, trash), s"park rename failed: $d")
    require(fs.rename(tmp, d), s"lift rename failed: $tmp")
    fs.delete(trash, true)
    ()
  }

  /** Index health for the rebuild decision ([[assignToExisting]]'s drift
    * contract): one summary row (n_lists = k, n_nonempty, n_vectors,
    * max_list, median_list over NONEMPTY lists, skew = max/median).
    * Frozen centroids drift as the ingest distribution shifts; when skew
    * exceeds ~8 — or n_nonempty collapses far below n_lists (dead probe
    * capacity: most centroids own nothing while real probes pile onto a
    * few lists, the degenerate-training pathology) — a [[rebuildIndex]]
    * is due. Cost: one aggregate over the assignment (k-sized result),
    * no driver traffic beyond the 1-row summary.
    */
  def indexStats(index: IvfIndex): DataFrame = {
    val counts = index.assigned.groupBy(col("__cid"))
      .agg(count(lit(1)).as("n"))
    counts.agg(
      count(lit(1)).as("n_nonempty"),
      sum(col("n")).as("n_vectors"),
      max(col("n")).as("max_list"),
      percentile_approx(col("n"), lit(0.5), lit(10000)).as("median_list"))
      .select(lit(index.centroids.length).as("n_lists"), col("n_nonempty"),
        col("n_vectors"), col("max_list"), col("median_list"))
      .withColumn("skew",
        round(col("max_list").cast("double") /
          greatest(col("median_list").cast("double"), lit(1.0)), 2))
  }

  /** Offline rebuild of a persisted index — the action [[indexStats]]'
    * skew signal calls for. Reloads the full-precision vectors (the
    * refine sidecar for a quantized layout, the lists otherwise),
    * retrains centroids (default k: [[ivfPolicy]]'s √N on the CURRENT
    * corpus size — growth since birth is priced in), reassigns every
    * vector, and saves to `newPath` preserving the quantize mode.
    *
    * Deliberately rebuild-to-a-new-path: production ANN serving keeps
    * versioned index directories and flips a pointer when the new build
    * is complete — probes never see a half-rewritten store, and the old
    * version remains for rollback. (In-place overwrite would also
    * self-conflict: the new assignment plan reads the very files it
    * would replace.) Returns the rebuilt in-memory index.
    */
  def rebuildIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   newPath: String, idCol: String, nCentroids: Int = 0,
                   iters: Int = 3, seed: Long = 42L,
                   maxTrainRows: Long = 100000L): IvfIndex = {
    require(newPath != path, "rebuild into a NEW versioned path, then flip")
    val existing = loadIndex(spark, path, idCol)
    // layout dispatch order matters: a PQ layout also lacks __vn in
    // lists/, so isQuantized alone would silently downgrade it to int8
    val pq = isPq(spark, path)
    val quantized = !pq && isQuantized(spark, path)
    val corpus = existing.assigned.select(col(idCol), col("__vn"))
    // count() over a bare parquet projection is footer-metadata work, not
    // a data scan — cheap enough to size k from the CURRENT corpus
    val k = if (nCentroids > 0) nCentroids else ivfPolicy(corpus.count())._1
    val rebuilt = buildIndex(corpus, idCol, "__vn", k, iters, seed, maxTrainRows)
    if (pq) {
      // preserve the index's PQ configuration — a default-config rebuild
      // would silently change the code bytes per vector and the
      // recall/IO profile of the index the caller is about to flip
      // serving to. The configured (m, kPerSub) comes from the pq_meta
      // file saveIndexPq writes; legacy layouts without it fall back to
      // inferring from codebook shape (which under-reads kPerSub when
      // k-means trained fewer centroids than configured — the reason
      // the meta file exists)
      val metaPath = new org.apache.hadoop.fs.Path(path + "/pq_meta")
      val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
      val (m, kPerSub) =
        if (fs.exists(metaPath)) {
          val r = spark.read.parquet(path + "/pq_meta").head()
          (r.getAs[Int]("m"), r.getAs[Int]("k_per_sub"))
        } else {
          val perSub = spark.read.parquet(path + "/pq").groupBy("subspace").count()
          val cfg = perSub.agg(
            count(lit(1)).cast("int"), max(col("count")).cast("int")).head()
          (cfg.getInt(0), cfg.getInt(1))
        }
      saveIndexPq(rebuilt, newPath, m = m, kPerSub = kPerSub)
    } else saveIndex(rebuilt, newPath, quantize = quantized)
    rebuilt
  }

  /** IVF top-k search over a built index: probe the `nProbe` nearest lists
    * per query. No training happens here — reuse one [[buildIndex]] result
    * across query batches.
    */
  def searchIndex(index: IvfIndex, queries: DataFrame,
                  queryIdCol: String, queryVecCol: String,
                  k: Int, nProbe: Int = 4): DataFrame = {
    val idCol = index.idCol
    val probes = probeFrame(queries, queryIdCol, queryVecCol,
      index.centroids, nProbe)
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    index.assigned.join(broadcast(probes), "__cid")
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        Similarity.dot(col("__vn"), col("__qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per query: rank all centroids, keep nProbe best lists — one native
    * top-nProbe expression per query row (no k-row fanout, no window
    * shuffle; probe order = score desc, ties toward the smaller cid).
    * Output: (queryIdCol, __qn unit query vector, __cid) — one row per
    * (query, probed list).
    */
  private def probeFrame(queries: DataFrame, queryIdCol: String,
                         queryVecCol: String,
                         centroids: Array[(Int, Array[Double])],
                         nProbe: Int): DataFrame = {
    val qUnit = unitVectors(queries, queryVecCol)
      .select(col(queryIdCol), col("__vn").as("__qn"))
    qUnit.select(col(queryIdCol), col("__qn"),
      explode(graft.functions.ArrayMath.topCentroidIds(
        col("__qn"), centroidMatrix(centroids),
        math.min(nProbe, centroids.length))).as("__cid"))
  }

  /** Top-k search directly over a `saveIndex(quantize = true)` layout — the
    * 100 TB serving path. The probe scan reads ONLY the int8 codes + scale
    * (~1/8 the bytes of the double lists; parquet column pruning keeps the
    * refine sidecar untouched) and scores candidates on the quantized dot
    * dot(x̂, q) = (scale/127)·Σ code_i·q_i — asymmetric: the query stays
    * full precision, per-element corpus error ≤ scale/254. The top
    * `rerankFactor·k` candidates per query are then re-ranked EXACTLY
    * against the full-precision refine sidecar; the candidate set is
    * |queries|·rerankFactor·k rows (skinny), broadcast into a join that
    * partition-prunes the refine read to the probed lists.
    */
  def searchIndexQuantized(spark: org.apache.spark.sql.SparkSession, path: String,
                           queries: DataFrame, queryIdCol: String, queryVecCol: String,
                           idCol: String, k: Int, nProbe: Int = 4,
                           rerankFactor: Int = 4): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val centroids = spark.read.parquet(path + "/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val lists = excludeTombstoned(spark, path, idCol,
      spark.read.parquet(path + "/lists"))
    require(lists.columns.contains("__code"),
      s"$path/lists is not a quantized layout — saveIndex(quantize = true)")
    val probes = probeFrame(queries, queryIdCol, queryVecCol, centroids, nProbe)

    val approx = lists.join(broadcast(probes), "__cid")
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col("__qn"), col("__cid"), col(idCol),
        (graft.functions.ArrayMath.int8Dot(col("__code"), col("__qn"))
          * col("__scale") / 127.0).as("__approx"))
    val wApprox = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__approx").desc, col(idCol))
    val candidates = approx
      .withColumn("__arank", row_number().over(wApprox))
      .filter(col("__arank") <= rerankFactor.toLong * k)
      .select(col(queryIdCol), col("__qn"), col("__cid"), col(idCol))

    val refine = spark.read.parquet(path + "/refine")
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    refine.join(broadcast(candidates), Seq("__cid", idCol))
      .select(col(queryIdCol), col(idCol),
        Similarity.dot(col("__vn"), col("__qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // -------------------------------------------------------------------
  // IVF-PQ tier (Jégou, Douze & Schmid, TPAMI 2011 — FAISS's IVFPQ
  // shape): m sub-spaces × ≤256 centroids each, one BYTE per subspace per
  // vector, so lists store in m bytes/vector — the next ~4× past the
  // scalar-int8 tier (dim bytes + an 8-byte scale) — under the SAME
  // re-rank contract (approximate candidates, exact final scores from
  // the refine sidecar).

  /** Default subspace count: sub-vectors of 4 dims (the FAISS-typical
    * granularity); for dims not divisible by 4, the largest divisor
    * keeping sub-vectors ≥ 2 dims wide.
    */
  def pqSubspaces(dim: Int): Int = {
    require(dim >= 2, s"PQ needs dim >= 2, got $dim")
    if (dim % 4 == 0) dim / 4
    else (dim / 2 to 1 by -1).find(m => dim % m == 0).get
  }

  /** Train per-subspace codebooks with plain L2 Lloyd iterations over a
    * bounded, expectation-exact sample (the [[trainSample]] mechanism;
    * FAISS also trains PQ on a sample). The sample collects to the
    * driver — |sample|·dim doubles, bounded by `maxTrainRows` exactly
    * like the centroid matrix path — and is sorted by id so training is
    * independent of partition layout. Empty clusters keep their previous
    * centroid (deterministic); effective per-subspace k is
    * min(kPerSub, |sample|).
    */
  def trainPqCodebooks(unitRows: DataFrame, idCol: String,
                       m: Int, kPerSub: Int = 256, iters: Int = 5,
                       seed: Long = 42L,
                       maxTrainRows: Long = 100000L): Array[Array[Array[Double]]] = {
    require(m >= 1 && kPerSub >= 1 && kPerSub <= 256,
      "PQ needs 1 <= kPerSub <= 256 (codes are single bytes)")
    val sample = trainSample(unitRows, idCol,
      math.max(maxTrainRows, 30L * kPerSub), seed)
      .collect()
      .sortBy(_.get(0).toString) // layout-invariant training order
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val kEff = math.min(kPerSub, sample.length)
    Array.tabulate(m) { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      lloydL2(pts, kEff, iters, seed + s)
    }
  }

  /** Plain L2 Lloyd k-means on the driver (points are a bounded training
    * sample; ~k·|sample|·subDim flops per iteration).
    */
  private def lloydL2(points: Array[Array[Double]], k: Int, iters: Int,
                      seed: Long): Array[Array[Double]] = {
    val n = points.length
    val d = points(0).length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle((0 until n).toVector).take(k)
    val centroids = init.map(i => points(i).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      var p = 0
      while (p < n) {
        val v = points(p)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0
          var j = 0
          while (j < d) { val df = v(j) - centroids(c)(j); dist += df * df; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var j = 0
        while (j < d) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } // empty cluster: keep previous centroid
        c += 1
      }
      it += 1
    }
    centroids
  }

  private def codebooksLit(books: Array[Array[Array[Double]]]): Column =
    typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)

  /** Persist an index in the PQ layout: lists hold (id, m-byte __pq code,
    * __cid) — ~m bytes/vector of serving I/O vs dim+8 for int8 — plus the
    * same full-precision `refine/` sidecar and centroid matrix, and a
    * `pq/` directory with the trained codebooks (subspace, cid, centroid).
    */
  def saveIndexPq(index: IvfIndex, path: String, m: Int = 0,
                  kPerSub: Int = 256, iters: Int = 5, seed: Long = 42L): Unit = {
    val spark = index.assigned.sparkSession
    ensureFns(spark)
    import spark.implicits._
    val assigned = index.assigned.repartition(col("__cid"))
    assigned.persist() // lists/ and refine/ must hold the identical row set
    try {
      val dim = Similarity.inferDim(index.assigned, "__vn")
      val mEff = if (m > 0) m else pqSubspaces(dim)
      val books = trainPqCodebooks(
        index.assigned.select(col(index.idCol), col("__vn")), index.idCol,
        mEff, kPerSub, iters, seed)
      assigned
        .withColumn("__pq", graft.functions.ArrayMath.pqEncode(
          col("__vn"), codebooksLit(books)))
        .select(col(index.idCol), col("__pq"), col("__cid"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("__cid").parquet(path + "/lists")
      assigned.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("__cid").parquet(path + "/refine")
      books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
      }.toSeq.toDF("subspace", "cid", "centroid")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(path + "/pq")
      // persist the CONFIGURED (m, kPerSub), not just the trained books:
      // on degenerate training sets k-means can emit fewer centroids
      // than kPerSub in every subspace, and a rebuild that infers config
      // from codebook shape would ratchet the capacity down permanently
      Seq((mEff, kPerSub)).toDF("m", "k_per_sub")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(path + "/pq_meta")
    } finally { assigned.unpersist(false); () }
    index.centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + "/centroids")
  }

  /** True when `path` holds a [[saveIndexPq]] layout. */
  def isPq(spark: org.apache.spark.sql.SparkSession, path: String): Boolean =
    spark.read.parquet(path + "/lists").columns.contains("__pq")

  /** Top-k search over a [[saveIndexPq]] layout — same contract as
    * [[searchIndexQuantized]]: probe nProbe lists, score candidates
    * approximately (here via the O(m)-per-candidate ADC loop against a
    * per-query lookup table riding the broadcast probe frame), re-rank
    * the top rerankFactor·k EXACTLY from the refine sidecar. Reported
    * cosines are always full precision.
    */
  def searchIndexPq(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, queryIdCol: String, queryVecCol: String,
                    idCol: String, k: Int, nProbe: Int = 4,
                    rerankFactor: Int = 4): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val centroids = spark.read.parquet(path + "/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val lists = excludeTombstoned(spark, path, idCol,
      spark.read.parquet(path + "/lists"))
    require(lists.columns.contains("__pq"),
      s"$path/lists is not a PQ layout — saveIndexPq first")
    val books = spark.read.parquet(path + "/pq")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    val kPerSub = books.map(_.length).max
    val probes = probeFrame(queries, queryIdCol, queryVecCol, centroids, nProbe)
      .withColumn("__lut", graft.functions.ArrayMath.pqLut(
        col("__qn"), codebooksLit(books)))

    val approx = lists.join(broadcast(probes), "__cid")
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col("__qn"), col("__cid"), col(idCol),
        graft.functions.ArrayMath.pqAdcScore(col("__pq"), col("__lut"), kPerSub)
          .as("__approx"))
    val wApprox = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__approx").desc, col(idCol))
    val candidates = approx
      .withColumn("__arank", row_number().over(wApprox))
      .filter(col("__arank") <= rerankFactor.toLong * k)
      .select(col(queryIdCol), col("__qn"), col("__cid"), col(idCol))

    val refine = spark.read.parquet(path + "/refine")
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    refine.join(broadcast(candidates), Seq("__cid", idCol))
      .select(col(queryIdCol), col(idCol),
        Similarity.dot(col("__vn"), col("__qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** One-shot convenience: build + search. For repeated query batches use
    * [[buildIndex]] once and [[searchIndex]] per batch (or [[saveIndex]] /
    * [[loadIndex]] across jobs).
    */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, queryIdCol: String, queryVecCol: String,
           k: Int, nCentroids: Int = 16, nProbe: Int = 4,
           iters: Int = 3, seed: Long = 42L,
           maxTrainRows: Long = 100000L): DataFrame =
    searchIndex(
      buildIndex(corpus, idCol, vecCol, nCentroids, iters, seed, maxTrainRows),
      queries, queryIdCol, queryVecCol, k, nProbe)
}
