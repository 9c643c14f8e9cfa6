package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming SCD1 upsert on plain parquet ([[StreamingIngest.upsertSink]]):
  * bucket-granular copy-on-write must equal sequential batch MERGEs, skip
  * replays, leave untouched buckets' files byte-for-byte alone, ignore torn
  * version directories, and hold the per-bucket retention floor.
  */
class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val nBuckets = 8

  private def freshDirs(): (java.nio.file.Path, String, String) = (
    java.nio.file.Files.createTempDirectory("graft-ups-in"),
    java.nio.file.Files.createTempDirectory("graft-ups-tgt").toString,
    java.nio.file.Files.createTempDirectory("graft-ups-ckpt").toString)

  private def wave(in: java.nio.file.Path, target: String, ckpt: String,
                   rows: Seq[(Long, String, Long)]): Long = {
    if (rows.nonEmpty)
      rows.toDF("k", "payload", "seq").coalesce(1)
        .write.mode("append").parquet(in.toString)
    StreamingIngest.upsertSink(spark,
      spark.readStream.schema("k BIGINT, payload STRING, seq BIGINT")
        .parquet(in.toString),
      "k", "seq", target, ckpt, nBuckets = nBuckets, keepVersions = 2)
  }

  private def served(target: String): Seq[(Long, String, Long)] =
    StreamingIngest.readUpsertTarget(spark, target)
      .select("k", "payload", "seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq

  /** Data files under the target, relative path -> size (markers and
    * checkpoints excluded) — the untouched-bucket certificate.
    */
  private def bucketFiles(target: String, bucket: Long): Seq[(String, Long)] = {
    val root = java.nio.file.Paths.get(target, s"b$bucket")
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out += ((root.relativize(p).toString, java.nio.file.Files.size(p)))
      }
      out.sortBy(_._1).toSeq
    }
  }

  private def bucketOf(k: Long): Long = {
    val d = Seq(k).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(nBuckets.toLong))).head()
    d.getLong(0)
  }

  test("waves fold into MERGE-equivalent state; updates replace, inserts append") {
    val (in, target, ckpt) = freshDirs()
    val w1 = Seq((1L, "a1", 10L), (2L, "b1", 10L), (3L, "c1", 10L))
    // wave 2 updates k=1 (higher seq wins), inserts k=4, and carries an
    // in-batch duplicate for k=4 whose LOWER seq must lose
    val w2 = Seq((1L, "a2", 20L), (4L, "d2", 20L), (4L, "d0", 5L))
    assert(wave(in, target, ckpt, w1) == 1L)
    assert(wave(in, target, ckpt, w2) == 1L)
    assert(served(target) == Seq(
      (1L, "a2", 20L), (2L, "b1", 10L), (3L, "c1", 10L), (4L, "d2", 20L)))
    // equivalence against the batch-mode MERGE the sink claims to stream
    val direct = graft.ops.ScaleOps.upsert(
      w1.toDF("k", "payload", "seq"), w2.toDF("k", "payload", "seq"),
      Seq("k"), Some("seq"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(served(target) == direct)
  }

  test("untouched buckets are not rewritten; replay applies nothing") {
    val (in, target, ckpt) = freshDirs()
    // keys 1 and 2 land in different buckets (verified, not assumed)
    assert(bucketOf(1L) != bucketOf(2L))
    assert(wave(in, target, ckpt, Seq((1L, "a1", 10L), (2L, "b1", 10L))) == 1L)
    val untouchedBefore = bucketFiles(target, bucketOf(2L))
    assert(untouchedBefore.nonEmpty)
    // wave 2 touches only k=1's bucket
    assert(wave(in, target, ckpt, Seq((1L, "a2", 20L))) == 1L)
    assert(bucketFiles(target, bucketOf(2L)) == untouchedBefore)
    assert(served(target) == Seq((1L, "a2", 20L), (2L, "b1", 10L)))
    // no new input: AvailableNow finds nothing or replays — state unchanged
    assert(wave(in, target, ckpt, Seq.empty) == 0L)
    assert(served(target) == Seq((1L, "a2", 20L), (2L, "b1", 10L)))
  }

  test("torn (uncommitted) version directories are invisible to readers") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, "a1", 10L))) == 1L)
    val before = served(target)
    val torn = java.nio.file.Paths.get(target, s"b${bucketOf(1L)}", "v999")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.writeString(torn.resolve("garbage.txt"), "not parquet")
    assert(served(target) == before)
  }

  test("stale uncommitted version from a crashed attempt is replaced, not served") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, "a1", 10L))) == 1L)
    // simulate a crashed batch-1 attempt that renamed its version dir in
    // but died before the commit marker: readers must ignore it now, and
    // the real batch 1 must overwrite it rather than nest into it
    val stale = java.nio.file.Paths.get(target, s"b${bucketOf(1L)}", "v1")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("junk.txt"), "leftover")
    assert(served(target) == Seq((1L, "a1", 10L)))
    assert(wave(in, target, ckpt, Seq((1L, "a2", 20L))) == 1L)
    assert(served(target) == Seq((1L, "a2", 20L)))
    assert(!java.nio.file.Files.exists(stale.resolve("junk.txt")),
      "crashed-attempt leftovers must be deleted by the committing replay")
  }

  test("12-wave churn: state equals a sequential MERGE fold, versions stay bounded") {
    val (in, target, ckpt) = freshDirs()
    // churn a 10-key space across 12 waves with monotone seq — the
    // streaming state must equal a driver-side fold of last-writer-wins
    val expected = scala.collection.mutable.Map.empty[Long, (String, Long)]
    var seq = 0L
    for (w <- 1 to 12) {
      val rows = (0 until 4).map { j =>
        seq += 1
        val k = ((w * 3 + j * 5) % 10).toLong
        (k, s"p$w-$j", seq)
      }
      rows.foreach { case (k, p, s) => expected(k) = (p, s) }
      assert(wave(in, target, ckpt, rows) == 1L)
    }
    assert(served(target) ==
      expected.toSeq.map { case (k, (p, s)) => (k, p, s) }.sortBy(_._1))
    // retention bound holds on EVERY bucket after heavy churn
    val root = java.nio.file.Paths.get(target)
    java.nio.file.Files.list(root).forEach { b =>
      if (b.getFileName.toString.startsWith("b")) {
        val nVersions = java.nio.file.Files.list(b).toArray
          .map(_.toString.split("/").last).count(_.startsWith("v"))
        assert(nVersions <= 2, s"bucket $b holds $nVersions versions (keepVersions=2)")
      }
    }
  }

  test("per-bucket retention keeps keepVersions committed versions") {
    val (in, target, ckpt) = freshDirs()
    val b = bucketOf(1L)
    assert(wave(in, target, ckpt, Seq((1L, "a1", 10L))) == 1L)
    assert(wave(in, target, ckpt, Seq((1L, "a2", 20L))) == 1L)
    assert(wave(in, target, ckpt, Seq((1L, "a3", 30L))) == 1L)
    val versions = java.nio.file.Files.list(
      java.nio.file.Paths.get(target, s"b$b")).toArray.map(_.toString)
      .filter(_.split("/").last.startsWith("v"))
    assert(versions.length == 2) // keepVersions = 2
    assert(served(target) == Seq((1L, "a3", 30L)))
  }

  test("mismatched bucket layout is rejected instead of serving stale keys") {
    // a re-run with a different nBuckets (or keyCol) remaps keys to other
    // buckets: the merge would read only the NEW buckets and leave stale
    // versions of moved keys serving duplicates from the old ones — the
    // layout is recorded at target birth and enforced on every entry
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, "a1", 10L))) == 1L)
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.upsertSink(spark,
        spark.readStream.schema("k BIGINT, payload STRING, seq BIGINT")
          .parquet(in.toString),
        "k", "seq", target,
        java.nio.file.Files.createTempDirectory("graft-ups-ckpt2").toString,
        nBuckets = nBuckets * 2, keepVersions = 2)
    }
    assert(ex.getMessage.contains("geometry"))
    val ex2 = intercept[IllegalArgumentException] {
      StreamingIngest.upsertSink(spark,
        spark.readStream.schema("k BIGINT, payload STRING, seq BIGINT")
          .parquet(in.toString),
        "seq", "k", target,
        java.nio.file.Files.createTempDirectory("graft-ups-ckpt3").toString,
        nBuckets = nBuckets, keepVersions = 2)
    }
    assert(ex2.getMessage.contains("geometry"))
    // the matching layout still enters fine
    assert(wave(in, target, ckpt, Seq.empty) == 0L)
  }
}
