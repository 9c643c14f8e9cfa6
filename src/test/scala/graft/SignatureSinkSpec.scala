package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming MEDIA signature dedup sink
  * ([[StreamingIngest.signatureAppendSink]]): exact and Hamming-near
  * signatures must be dropped across micro-batches via partition-pruned
  * cell probes, within-batch duplicates resolved first, null signatures
  * id-idempotent, geometry enforced, and the image-dHash projection
  * composing with the sink unchanged under Structured Streaming.
  */
class SignatureSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 0x0fedcba987654321L

  private def freshDirs(): (java.nio.file.Path, String, String) = (
    Files.createTempDirectory("graft-sig-in"),
    Files.createTempDirectory("graft-sig-tgt").toString,
    Files.createTempDirectory("graft-sig-ckpt").toString)

  private def wave(in: java.nio.file.Path, target: String, ckpt: String,
                   rows: Seq[(Long, java.lang.Long)]): Long = {
    if (rows.nonEmpty)
      rows.toDF("media_id", "sig").coalesce(1)
        .write.mode("append").parquet(in.toString)
    StreamingIngest.signatureAppendSink(spark,
      spark.readStream.schema("media_id BIGINT, sig BIGINT")
        .parquet(in.toString),
      "media_id", "sig", target, ckpt, maxDistance = 2, nBuckets = 8,
      cellBuckets = 16)
  }

  private def servedIds(target: String): Seq[Long] =
    StreamingIngest.readSignatureTarget(spark, target)
      .select("media_id").as[Long].collect().sorted.toSeq

  test("exact and near signatures dropped across batches; distinct kept; replay no-op") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, base), (2L, ~base))) == 2L)
    // wave 2: exact copy (new id), d=1, d=2, d=7 (far — kept)
    val appended = wave(in, target, ckpt, Seq(
      (10L, base), (11L, base ^ 1L), (12L, base ^ 0x0101L),
      (13L, base ^ 0x7fL)))
    assert(appended == 1L, "only the d=7 signature is genuinely new")
    assert(servedIds(target) == Seq(1L, 2L, 13L))
    // wave 3 with nothing new: committed markers + probes both say no-op
    assert(wave(in, target, ckpt, Nil) == 0L)
  }

  test("re-delivery from scratch (fresh checkpoint, cleared commits) appends nothing") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, base), (2L, base ^ 0xf0f0L))) == 2L)
    // the documented pattern: a new checkpoint restarts batch numbering,
    // so commits are cleared AND the input is re-delivered from scratch —
    // the cell probe (self-collisions id-excluded) + id anti-join must
    // re-drop everything
    val (targetPath, _) = (new org.apache.hadoop.fs.Path(target), ())
    val fs = targetPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(targetPath, "_graft_commits"), true)
    val ckpt2 = Files.createTempDirectory("graft-sig-ckpt2").toString
    assert(wave(in, target, ckpt2, Nil) == 0L)
    assert(servedIds(target) == Seq(1L, 2L))
  }

  test("within-batch: exact winner per signature, then greedy near rule") {
    val (in, target, ckpt) = freshDirs()
    // 3×identical, a d=1 neighbor, one far
    val appended = wave(in, target, ckpt, Seq(
      (5L, base), (6L, base), (7L, base), (8L, base ^ 2L), (9L, ~base)))
    assert(appended == 2L)
    assert(servedIds(target) == Seq(5L, 9L),
      "min-id survives its clique AND its near-neighbors")
  }

  test("null signatures: appended once, never near-deduped, id-idempotent") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq(
      (1L, null), (2L, null), (3L, base))) == 3L,
      "two null-sig docs are not dups of each other")
    // re-deliver id 1 with a null sig in a later batch → id anti-join drops
    assert(wave(in, target, ckpt, Seq((1L, null))) == 0L)
    assert(servedIds(target) == Seq(1L, 2L, 3L))
  }

  test("geometry marker: mismatched re-entry fails loudly") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, base))) == 1L)
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.signatureAppendSink(spark,
        spark.readStream.schema("media_id BIGINT, sig BIGINT")
          .parquet(in.toString),
        "media_id", "sig", target,
        Files.createTempDirectory("graft-sig-ckpt3").toString,
        nBuckets = 32, cellBuckets = 16)
    }
    assert(e.getMessage.contains("geometry"))
  }

  test("bootstrap: batch-built corpus serves the sink's probes") {
    val (in, target, ckpt) = freshDirs()
    val corpus = Seq[(Long, java.lang.Long)](
      (100L, base), (101L, ~base)).toDF("media_id", "sig")
    assert(StreamingIngest.bootstrapSignatureTarget(spark, corpus,
      "media_id", "sig", target, nBuckets = 8, cellBuckets = 16) == 2L)
    // near copy of a BOOTSTRAPPED signature must drop; new one appends
    val appended = wave(in, target, ckpt, Seq(
      (1L, base ^ 1L), (2L, base ^ 0x00ff00ffL)))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(2L, 100L, 101L))
    // bootstrap into a non-empty target refuses
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.bootstrapSignatureTarget(spark, corpus,
        "media_id", "sig", target, nBuckets = 8, cellBuckets = 16)
    }
    assert(e.getMessage.contains("empty target"))
  }

  test("production composition: PNG stream → dHash projection → sink drops the re-upload") {
    val in = Files.createTempDirectory("graft-sigimg-in")
    val target = Files.createTempDirectory("graft-sigimg-tgt").toString
    val ckpt = Files.createTempDirectory("graft-sigimg-ckpt").toString
    def imgWave(rows: Seq[(Long, Array[Byte])]): Long = {
      rows.toDF("media_id", "bytes").coalesce(1)
        .write.mode("append").parquet(in.toString)
      val stream = spark.readStream.schema("media_id BIGINT, bytes BINARY")
        .parquet(in.toString)
        .withColumn("sig",
          graft.functions.ArrayMath.imageDHash64(col("bytes")))
      StreamingIngest.signatureAppendSink(spark, stream, "media_id", "sig",
        target, ckpt, maxDistance = 2, nBuckets = 8, cellBuckets = 16)
    }
    // NB: two gradient fixtures with different colors still dHash within
    // a small Hamming ball of each other (both are monotone ramps — the
    // hash correctly calls them visually near-identical), so the
    // "distinct" second image here is distinct by STRUCTURE: a gradient
    // vs a same-size image whose sampled luma alternates (checker via
    // 1-px-wide gradient stripes is not expressible with the fixture
    // encoder, so use a much smaller image whose 9×8 grid resamples the
    // SAME pixels repeatedly — flat rows → all-zero dhash, far from the
    // ramp's all-ones)
    val img1 = graft.functions.PngEncodeKernel.encode(40, 30, 10, 80, 150)
    val flat = graft.functions.PngEncodeKernel.encode(1, 1, 7, 7, 7)
    assert(imgWave(Seq((1L, img1), (2L, flat))) == 2L)
    // the same pixels re-uploaded under a new id → identical dHash → drop;
    // junk bytes (null sig) → append
    val appended = imgWave(Seq((10L, img1.clone()),
      (11L, Array[Byte](1, 2, 3))))
    assert(appended == 1L)
    assert(StreamingIngest.readSignatureTarget(spark, target)
      .select("media_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L))
  }
}
