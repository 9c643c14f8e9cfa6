package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("firstSeen keeps exactly one doc per fingerprint across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sdedup")
    // batch 1: two distinct docs + one dup of doc 1
    Seq((1L, "the quick brown fox"), (2L, "a different document"),
      (3L, "THE  quick   brown fox")) // same normalized content as doc 1
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)

    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val out = StreamingDedup.firstSeen(spark, stream, "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    q.processAllAvailable()

    // batch 2: another dup of doc 1 plus a new doc
    Seq((4L, "the quick brown fox"), (5L, "yet another new document"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sdedup").collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(rows(1L) == false) // first seen
    assert(rows(2L) == false)
    assert(rows(3L) == true)  // in-batch duplicate of 1
    assert(rows(4L) == true)  // CROSS-batch duplicate of 1 (state held)
    assert(rows(5L) == false)
    // survivors = exactly one per distinct fingerprint
    val survivors = rows.filter(!_._2).keys.toSeq.sorted
    assert(survivors == Seq(1L, 2L, 5L))
  }

  test("withinWatermark dedups by content with event-time-bounded state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wmdedup")
    // duplicates within the watermark horizon; distinct content kept
    Seq(
      (1L, "2024-01-01 10:00:00", "same content here"),
      (2L, "2024-01-01 10:10:00", "same  CONTENT   here"), // dup of 1 (normalized)
      (3L, "2024-01-01 10:20:00", "different content entirely"))
      .toDF("doc_id", "ts_s", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("append").parquet(dir.toString)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(dir.toString)
    val q = StreamingDedup.withinWatermark(stream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_dedup").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wm_dedup").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("dedupAppendSink: incremental insert-only upsert to parquet") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = Files.createTempDirectory("graft-dsink-in")
    val target = Files.createTempDirectory("graft-dsink-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-dsink-c")

    // wave 1: key 10 twice (order by version — v2 wins in-batch), key 20
    Seq((10L, 1L, "ten-v1"), (10L, 0L, "ten-v0"), (20L, 0L, "twenty"))
      .toDF("k", "version", "payload").coalesce(1)
      .write.mode("append").parquet(in.toString)
    val n1 = StreamingIngest.dedupAppendSink(spark,
      spark.readStream.schema("k LONG, version LONG, payload STRING")
        .parquet(in.toString),
      "k", "version", target.toString, ckpt.toString)
    assert(n1 == 2L)

    // wave 2: key 10 again (already in target -> dropped), new key 30
    Seq((10L, 5L, "ten-v5"), (30L, 0L, "thirty"))
      .toDF("k", "version", "payload").coalesce(1)
      .write.mode("append").parquet(in.toString)
    val n2 = StreamingIngest.dedupAppendSink(spark,
      spark.readStream.schema("k LONG, version LONG, payload STRING")
        .parquet(in.toString),
      "k", "version", target.toString, ckpt.toString)
    assert(n2 == 1L)

    val got = spark.read.parquet(target.toString).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // first-arrival-wins across waves; min-version wins within a batch
    assert(got == Map(10L -> "ten-v0", 20L -> "twenty", 30L -> "thirty"))
  }

  test("dedupAppendSink: per-batch target scan is bucket-pruned and does not grow with history") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    import org.apache.spark.sql.execution.FileSourceScanExec
    val in = Files.createTempDirectory("graft-dprune-in")
    val target = Files.createTempDirectory("graft-dprune-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-dprune-c")
    val nBuckets = 16

    // deterministic bucket arithmetic (same expression the sink uses)
    def bucketOf(keys: Seq[Long]): Map[Long, Long] =
      keys.toDF("k").select(col("k"),
        pmod(xxhash64(col("k")), lit(nBuckets.toLong)).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeKey = 1L
    val probeBucket = bucketOf(Seq(probeKey))(probeKey)
    // filler keys that provably do NOT share the probe key's bucket
    val fillers = bucketOf((1000L until 1400L).toSeq)
      .filter(_._2 != probeBucket).keys.toSeq.sorted.take(120)
    assert(fillers.size == 120)

    // capture the sink's ACTUAL target scans (selected-file counts after
    // partition pruning) from the executed plans of the foreachBatch jobs.
    // Plain .collect() stops at AdaptiveSparkPlanExec / QueryStageExec
    // boundaries, so walk through them explicitly.
    def targetScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val buf = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
      def go(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec        => go(q.plan)
        // the sink persists its frames — the target scan lives inside the
        // cached relation's plan, not in the visible children
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          go(c.relation.cachedPlan)
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft-dprune-t")) =>
          buf += s
        case other => other.children.foreach(go)
      }
      go(p); buf.toSeq
    }
    val scanned = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        targetScans(qe.executedPlan).foreach(s => scanned.add(s.metrics("numFiles").value))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    def sinkWave(keys: Seq[Long]): Long = {
      keys.map(k => (k, 0L, s"p$k")).toDF("k", "version", "payload").coalesce(1)
        .write.mode("append").parquet(in.toString)
      StreamingIngest.dedupAppendSink(spark,
        spark.readStream.schema("k LONG, version LONG, payload STRING")
          .parquet(in.toString),
        "k", "version", target.toString, ckpt.toString, nBuckets = nBuckets)
    }
    def drainListener(): Unit = { // listener bus is async — settle before reading
      val deadline = System.currentTimeMillis() + 10000
      var last = -1
      while (System.currentTimeMillis() < deadline &&
             (scanned.size() == 0 || scanned.size() != last)) {
        last = scanned.size(); Thread.sleep(300)
      }
    }

    assert(sinkWave(Seq(probeKey, 2L)) == 2L)          // seed probe bucket
    assert(sinkWave(fillers.take(60)) == 60L)          // history, other buckets
    spark.listenerManager.register(listener)
    try {
      assert(sinkWave(Seq(probeKey)) == 0L)            // pure dup — probe scan 1
      drainListener()
      val scanA = scanned.toArray.map(_.asInstanceOf[Long]).max
      scanned.clear()
      assert(sinkWave(fillers.drop(60)) == 60L)        // MORE history elsewhere
      scanned.clear()
      assert(sinkWave(Seq(probeKey)) == 0L)            // pure dup — probe scan 2
      drainListener()
      val scanB = scanned.toArray.map(_.asInstanceOf[Long]).max
      // pruned: the dup batch reads its own bucket, not the whole corpus
      val totalFiles = java.nio.file.Files.walk(target)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      assert(scanA < totalFiles, s"scan $scanA should prune ($totalFiles total files)")
      // and HISTORY GROWTH in other buckets does not grow the scan
      assert(scanB == scanA,
        s"per-batch scan grew with unrelated history: $scanA -> $scanB")
    } finally spark.listenerManager.unregister(listener)
    // correctness unchanged: first arrival still wins
    val got = spark.read.parquet(target.toString).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(probeKey) == "p1" && got.size == 122)
  }

  test("dedupAppendSink: null keys dedup like any other key") {
    // xxhash64(null) is null and equi anti-joins never match null = null —
    // without the sentinel bucket + null-safe join, a null-keyed row would
    // re-insert every single batch
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = Files.createTempDirectory("graft-dnull-in")
    val target = Files.createTempDirectory("graft-dnull-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-dnull-c")
    def wave(rows: Seq[(java.lang.Long, Long, String)]): Long = {
      rows.toDF("k", "version", "payload").coalesce(1)
        .write.mode("append").parquet(in.toString)
      StreamingIngest.dedupAppendSink(spark,
        spark.readStream.schema("k LONG, version LONG, payload STRING")
          .parquet(in.toString),
        "k", "version", target.toString, ckpt.toString, nBuckets = 4)
    }
    // wave 1: two null-keyed rows (in-batch dedup → first wins) + a real key
    assert(wave(Seq((null, 0L, "n0"), (null, 1L, "n1"), (7L, 0L, "seven"))) == 2L)
    // wave 2: another null-keyed row + a dup of 7 → both dropped
    assert(wave(Seq((null, 2L, "n2"), (7L, 1L, "seven-again"))) == 0L)
    val rows = spark.read.parquet(target.toString).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(2)).toMap
    assert(rows == Map(-1L -> "n0", 7L -> "seven"))
  }

  test("dedupAppendSink survives a pre-created/crashed target dir (no data files)") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = Files.createTempDirectory("graft-dcrash-in")
    val target = Files.createTempDirectory("graft-dcrash-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-dcrash-c")
    // simulate a crashed first batch: target exists but holds only
    // _temporary litter — the old exists() probe then read-parquet'd an
    // empty dir and failed the stream on every retry
    java.nio.file.Files.createDirectories(target.resolve("_temporary/0"))
    Seq((1L, 0L, "one")).toDF("k", "version", "payload").coalesce(1)
      .write.mode("append").parquet(in.toString)
    val n = StreamingIngest.dedupAppendSink(spark,
      spark.readStream.schema("k LONG, version LONG, payload STRING")
        .parquet(in.toString),
      "k", "version", target.toString, ckpt.toString)
    assert(n == 1L)
    assert(spark.read.parquet(target.toString).count() == 1L)
  }

  test("compactDedupTarget folds per-bucket small files; idempotence intact") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = Files.createTempDirectory("graft-dcomp-in")
    val target = Files.createTempDirectory("graft-dcomp-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-dcomp-c")
    def wave(keys: Seq[Long]): Long = {
      keys.map(k => (k, 0L, s"p$k")).toDF("k", "version", "payload").coalesce(1)
        .write.mode("append").parquet(in.toString)
      StreamingIngest.dedupAppendSink(spark,
        spark.readStream.schema("k LONG, version LONG, payload STRING")
          .parquet(in.toString),
        "k", "version", target.toString, ckpt.toString, nBuckets = 4)
    }
    // 6 waves over 4 buckets: buckets accumulate multiple small files
    (0 until 6).foreach(i => assert(wave((i * 10L) until (i * 10L + 10L)) == 10L))
    def dataFiles() = java.nio.file.Files.walk(target)
      .filter(p => p.getFileName.toString.endsWith(".parquet")).count()
    val before = dataFiles()
    val rowsBefore = spark.read.parquet(target.toString)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    val compacted = StreamingIngest.compactDedupTarget(spark, target.toString)
    assert(compacted > 0, "multi-file buckets must compact")
    val after = dataFiles()
    assert(after < before, s"file count must drop: $before -> $after")
    assert(after <= 4L, "each bucket should fold to one file at default sizing")
    // rows byte-identical, and the sink still drops already-seen keys
    val rowsAfter = spark.read.parquet(target.toString)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    assert(rowsAfter == rowsBefore)
    assert(wave(Seq(5L, 15L, 25L)) == 0L, "dup keys must still be dropped after compaction")
  }

  test("rebucketDedupTarget migrates the layout; keys exact, idempotence and pruning intact") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = Files.createTempDirectory("graft-drb-in")
    val target = Files.createTempDirectory("graft-drb-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-drb-c")
    def wave(rows: Seq[(java.lang.Long, Long, String)], nBuckets: Int): Long = {
      rows.toDF("k", "version", "payload").coalesce(1)
        .write.mode("append").parquet(in.toString)
      StreamingIngest.dedupAppendSink(spark,
        spark.readStream.schema("k LONG, version LONG, payload STRING")
          .parquet(in.toString),
        "k", "version", target.toString, ckpt.toString, nBuckets = nBuckets)
    }
    // birth at 4 buckets, including a null key (sentinel-bucket path)
    val keyed = (0L until 80L).map(k => (java.lang.Long.valueOf(k), 0L, s"p$k"))
    assert(wave(keyed :+ ((null: java.lang.Long, 0L, "null-payload")), 4) == 81L)
    val before = spark.read.parquet(target.toString)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2)))
      .sortBy(_._1).toSeq

    val rows = StreamingIngest.rebucketDedupTarget(spark, target.toString, "k", 16)
    assert(rows == 81L)

    // rows/keys byte-identical across the migration
    val after = spark.read.parquet(target.toString)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(after == before)

    // the new layout is partitioned by the 16-bucket hash — every row sits
    // in exactly the dir the sink's bucket expression would compute, so the
    // anti-join's partition pruning works unchanged at the new count
    val placed = spark.read.parquet(target.toString)
      .select(col("k"), col(StreamingIngest.bucketCol).cast("long").as("b"))
      .withColumn("expect", coalesce(pmod(xxhash64(col("k")), lit(16L)), lit(0L)))
      .filter(col("b") =!= col("expect")).count()
    assert(placed == 0L, "rows landed outside their 16-bucket partition")
    val dirs = java.nio.file.Files.list(target).iterator()
    val kbDirs = scala.collection.mutable.Set[String]()
    while (dirs.hasNext) { val p = dirs.next().getFileName.toString
      if (p.startsWith(StreamingIngest.bucketCol + "=")) kbDirs += p }
    assert(kbDirs.size > 4, s"expected >4 bucket dirs after rebucket, got $kbDirs")

    // idempotence at the NEW bucket count: dups dropped, fresh keys land
    assert(wave(Seq((java.lang.Long.valueOf(5L), 9L, "dup"),
      (null: java.lang.Long, 9L, "null-dup")), 16) == 0L)
    assert(wave(Seq((java.lang.Long.valueOf(500L), 0L, "fresh")), 16) == 1L)
    assert(spark.read.parquet(target.toString).count() == 82L)
  }

  test("rebucketDedupTarget recovers crashed attempts: rerun restores, then migrates") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val in = Files.createTempDirectory("graft-drbc-in")
    val target = Files.createTempDirectory("graft-drbc-t").resolve("tbl")
    val ckpt = Files.createTempDirectory("graft-drbc-c")
    (0L until 40L).map(k => (k, 0L, s"p$k")).toDF("k", "version", "payload")
      .coalesce(1).write.mode("append").parquet(in.toString)
    StreamingIngest.dedupAppendSink(spark,
      spark.readStream.schema("k LONG, version LONG, payload STRING")
        .parquet(in.toString),
      "k", "version", target.toString, ckpt.toString, nBuckets = 4)
    def keys() = spark.read.parquet(target.toString)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val expect = keys()
    assert(expect.size == 40)

    // phase-1 crash: SOME buckets parked under _graft_rebucket_old, no
    // fence marker — a rerun must move them back before migrating
    val old = target.resolve("_graft_rebucket_old")
    JFiles.createDirectories(old)
    val parkedDirs = JFiles.list(target).iterator()
    var moved = 0
    while (parkedDirs.hasNext && moved < 2) {
      val p = parkedDirs.next()
      if (p.getFileName.toString.startsWith(StreamingIngest.bucketCol + "=")) {
        JFiles.move(p, old.resolve(p.getFileName.toString)); moved += 1
      }
    }
    assert(moved == 2)
    assert(StreamingIngest.rebucketDedupTarget(spark, target.toString, "k", 8) == 40L)
    assert(keys() == expect, "phase-1 crash recovery lost rows")

    // phase-2 crash: ALL buckets parked + parked fence + half-lifted junk
    // in the target — a rerun must discard the junk, restore, migrate
    val dirs2 = JFiles.list(target).iterator()
    JFiles.createDirectories(old)
    while (dirs2.hasNext) {
      val p = dirs2.next()
      if (p.getFileName.toString.startsWith(StreamingIngest.bucketCol + "="))
        JFiles.move(p, old.resolve(p.getFileName.toString))
    }
    JFiles.createFile(target.resolve("_graft_rebucket_parked"))
    // half-lifted garbage dir that must NOT survive recovery
    val junk = target.resolve(StreamingIngest.bucketCol + "=99")
    JFiles.createDirectories(junk)
    JFiles.copy(
      JFiles.list(old.resolve(JFiles.list(old).iterator().next().getFileName.toString))
        .iterator().next(),
      junk.resolve("junk.parquet"), StandardCopyOption.REPLACE_EXISTING)
    assert(StreamingIngest.rebucketDedupTarget(spark, target.toString, "k", 16) == 40L)
    assert(keys() == expect, "phase-2 crash recovery lost or duplicated rows")
    assert(!JFiles.exists(target.resolve("_graft_rebucket_parked")))
    assert(!JFiles.exists(old))
  }

  test("firstSeen runs on the RocksDB state store backend") {
    import spark.implicits._
    val prior = StreamingDedup.rocksDbStateStore.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StreamingDedup.rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = Files.createTempDirectory("graft-sdedup-rocks")
      Seq((1L, "rocks doc one"), (2L, "rocks doc one"), (3L, "rocks doc two"))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir.toString)
      val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir.toString)
      val q = StreamingDedup.firstSeen(spark, stream, "doc_id", "text")
        .writeStream.outputMode("append").format("memory").queryName("sdedup_rocks").start()
      q.processAllAvailable()
      // cross-batch state must survive on the RocksDB backend too
      Seq((4L, "rocks doc two")).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      // confirm the query actually ran RocksDB, not the HDFS default
      val usedProvider = q.lastProgress.stateOperators.headOption
        .map(_.customMetrics.keySet.toString).getOrElse("")
      q.stop()
      val rows = spark.table("sdedup_rocks").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(rows == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
      assert(usedProvider.contains("rocksdb"), s"expected rocksdb metrics, got $usedProvider")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("firstSeen with TTL evicts idle fingerprints (bounded-state contract)") {
    // ProcessingTimeTimeout makes the engine construct batches continuously
    // (shouldRunAnotherBatch is always true), so NONE of the draining waits
    // (processAllAvailable / AvailableNow+awaitTermination) ever return for
    // this query shape. The test runs a long-lived query on a real trigger
    // interval and POLLS the memory sink; timeout eviction happens in the
    // automatic no-data batches between arrivals.
    import spark.implicits._
    import scala.concurrent.duration._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-sdedup-ttl")
    Seq((1L, "ttl doc alpha")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir.toString)
    val q = StreamingDedup.firstSeen(spark, stream, "doc_id", "text", ttl = Some(3.seconds))
      .writeStream.outputMode("append").format("memory").queryName("sdedup_ttl")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("sdedup_ttl").count() < n) {
        assert(System.currentTimeMillis() < deadline, s"timed out waiting for $n output rows")
        Thread.sleep(100)
      }
    }
    try {
      awaitRows(1)
      // within the TTL: same content is still a duplicate (state retained)
      Seq((2L, "ttl doc alpha")).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir.toString)
      awaitRows(2)
      Thread.sleep(5000) // let the 3 s TTL lapse; no-data batches evict alpha
      // alpha re-arrives AFTER eviction: re-emitted as first-seen
      Seq((3L, "ttl doc alpha")).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir.toString)
      awaitRows(3)
    } finally q.stop()
    val rows = spark.table("sdedup_ttl").collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(rows(1L) == false)
    assert(rows(2L) == true, "re-arrival within the TTL must still be a duplicate")
    assert(rows(3L) == false, "evicted fingerprint must be first-seen again after TTL")
  }
}
