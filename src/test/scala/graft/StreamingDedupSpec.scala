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
}
