package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming near-duplicate dedup sink ([[StreamingIngest.nearDupAppendSink]]):
  * exact and NEAR copies of corpus documents must be dropped across
  * micro-batches (exact via the fingerprint pseudo-band, near via verified
  * LSH collisions), within-batch duplicates resolved first, short
  * no-shingle documents still exact-deduped, replays applying nothing.
  */
class NearDupSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // long enough that a one-token edit keeps est_jaccard >= 0.8 and a
  // different topic keeps it far below
  private val baseA = ("alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
    "omega one two three four five six seven eight nine ten eleven twelve")
  private val nearA = baseA.replace("twelve", "thirteen")
  private val baseB = "a completely different document about spark shuffles " +
    "partitions broadcast joins codegen catalyst tungsten executors tasks " +
    "stages jobs drivers clusters memory spill disks networks racks zones"

  private def freshDirs(): (java.nio.file.Path, String, String) = (
    Files.createTempDirectory("graft-nd-in"),
    Files.createTempDirectory("graft-nd-tgt").toString,
    Files.createTempDirectory("graft-nd-ckpt").toString)

  private def wave(in: java.nio.file.Path, target: String, ckpt: String,
                   rows: Seq[(Long, String)]): Long = {
    if (rows.nonEmpty)
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
    StreamingIngest.nearDupAppendSink(spark,
      spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in.toString),
      "doc_id", "text", target, ckpt, nBuckets = 8)
  }

  private def servedIds(target: String): Seq[Long] =
    StreamingIngest.readNearDupTarget(spark, target)
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("exact and near corpus copies dropped across batches; distinct docs kept") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA), (2L, baseB))) == 2L)
    // wave 2: exact copy of A (new id), NEAR copy of A, one genuinely new doc
    val appended = wave(in, target, ckpt, Seq(
      (10L, baseA), (11L, nearA),
      (12L, "an entirely novel third document about minhash banding and " +
        "jaccard similarity estimation across buckets bands rows hashes")))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 2L, 12L))
  }

  test("within-batch exact and near duplicates resolve to one survivor") {
    val (in, target, ckpt) = freshDirs()
    val appended = wave(in, target, ckpt, Seq(
      (5L, baseA), (6L, baseA), (7L, nearA), (8L, baseB)))
    assert(appended == 2L) // min-id survivor of the A-group, plus B
    assert(servedIds(target) == Seq(5L, 8L))
  }

  test("short no-shingle documents are still exact-deduped via the fingerprint band") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, "hi"), (2L, baseB))) == 2L)
    // exact copy of the short doc (different id) and a new short doc
    val appended = wave(in, target, ckpt, Seq((3L, "HI "), (4L, "yo")))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 2L, 4L))
  }

  test("no new input applies nothing; served set is stable") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA))) == 1L)
    assert(wave(in, target, ckpt, Seq.empty) == 0L)
    assert(servedIds(target) == Seq(1L))
  }

  test("dissimilar docs sharing no LSH band survive signature verification") {
    // near-threshold behavior: the verification step must not drop docs
    // that merely collide in a band but fail est_jaccard — construct a
    // collision-prone pair by sharing HALF the text (est ~0.3-0.5 < 0.8)
    val half = baseA.split(" ").take(20).mkString(" ")
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA))) == 1L)
    val appended = wave(in, target, ckpt, Seq(
      (2L, half + " entirely different tail tokens follow here now with " +
        "more unrelated words appended until the overlap fraction drops")))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 2L))
  }
}
