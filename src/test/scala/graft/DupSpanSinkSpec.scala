package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Incremental ExactSubstr sink: per-wave span marking must equal the
  * batch dupSpans over (corpus-so-far ∪ wave) for the arriving docs,
  * the digest plane must carry state across separate invocations
  * (cross-JVM-style), and replayed deliveries must be id-idempotent.
  */
class DupSpanSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def spansOf(dir: String, id: Long): Seq[(Long, Long)] =
    StreamingIngest.readDupSpanTarget(spark, dir)
      .filter(col("doc_id") === id)
      .select(explode(col("dup_spans")).as("s"))
      .select(col("s.span_start"), col("s.span_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("cross-wave marking == batch dupSpans for arriving docs; replay idempotent") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-dsp-in")
    val target = Files.createTempDirectory("graft-dsp-t").toString
    val ckpt = Files.createTempDirectory("graft-dsp-c").toString
    def deliver(rows: Seq[(Long, String)]): Long = {
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
      StreamingIngest.dupSpanAppendSink(spark,
        spark.readStream.schema("doc_id LONG, text STRING")
          .parquet(in.toString),
        "doc_id", "text", target, ckpt, k = 3, nBuckets = 8)
    }
    // wave 1: doc 1 unique; doc 2 repeats itself ("x y z" twice)
    val w1 = Seq((1L, "a b c d e f"), (2L, "x y z q x y z"))
    assert(deliver(w1) == 2L)
    assert(spansOf(target, 1L).isEmpty)
    // "x y z" at 0 and 4: windows 0 and 4 marked -> two islands
    assert(spansOf(target, 2L) == Seq((0L, 3L), (4L, 7L)))

    // wave 2: doc 3 copies doc 1's "b c d e"; doc 4 unique
    val w2 = Seq((3L, "p q b c d e r"), (4L, "totally new words here"))
    assert(deliver(w2) == 2L)
    // batch-equivalence: spans(doc 3) == dupSpans(all docs so far) at doc 3
    val all = (w1 ++ w2).toDF("doc_id", "text")
    val batchSpans = graft.ops.TextOps.dupSpans(all, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 3L)
      .select(col("span_start"), col("span_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(spansOf(target, 3L) == batchSpans && batchSpans.nonEmpty,
      s"sink ${spansOf(target, 3L)} vs batch $batchSpans")
    assert(spansOf(target, 4L).isEmpty)
    // doc 1 is NOT retro-marked (append-only first-wins contract)
    assert(spansOf(target, 1L).isEmpty)

    // replay the same input through a FRESH checkpoint: ids are
    // idempotent, nothing re-appends
    val ckpt2 = Files.createTempDirectory("graft-dsp-c2").toString
    val again = StreamingIngest.dupSpanAppendSink(spark,
      spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(in.toString),
      "doc_id", "text", target, ckpt2, k = 3, nBuckets = 8)
    assert(again == 0L, s"replay must append nothing, got $again")
    assert(StreamingIngest.readDupSpanTarget(spark, target).count() == 4L)

    // geometry contract: a different k must refuse
    val ckpt3 = Files.createTempDirectory("graft-dsp-c3").toString
    val e = intercept[Exception] {
      StreamingIngest.dupSpanAppendSink(spark,
        spark.readStream.schema("doc_id LONG, text STRING")
          .parquet(in.toString),
        "doc_id", "text", target, ckpt3, k = 4, nBuckets = 8)
    }
    assert(e.getMessage != null)
  }
}
