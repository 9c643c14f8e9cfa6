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
