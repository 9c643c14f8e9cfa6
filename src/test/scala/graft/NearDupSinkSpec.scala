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

  test("torn replay after bands/sigs landed still appends the docs (self-collision filtered)") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA))) == 1L)
    // simulate a crash AFTER the bands+sigs appends but BEFORE the docs
    // append and marker: wipe the docs plane and the commit marker, then
    // re-deliver the same input through a fresh checkpoint. The batch's
    // own band rows are already in the plane — without the self-collision
    // filter the doc would be dropped as its own duplicate and stay
    // invisible forever.
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
      }
    rmTree(java.nio.file.Paths.get(target, "docs"))
    rmTree(java.nio.file.Paths.get(target, "_graft_commits"))
    val ckpt2 = Files.createTempDirectory("graft-nd-ckpt2").toString
    assert(StreamingIngest.nearDupAppendSink(spark,
      spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in.toString),
      "doc_id", "text", target, ckpt2, nBuckets = 8) == 1L)
    assert(servedIds(target) == Seq(1L))
  }

  test("no new input applies nothing; served set is stable") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA))) == 1L)
    assert(wave(in, target, ckpt, Seq.empty) == 0L)
    assert(servedIds(target) == Seq(1L))
  }

  test("bands-plane probe is partition-pruned to the buckets hit") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (in, target, ckpt) = freshDirs()
    // several waves of distinct docs so the bands plane spans many buckets
    val mk = (i: Long) => (i, s"document number $i about topic ${i % 7} " +
      s"with unique filler ${i * 31} ${i * 37} ${i * 41} ${i * 43} " +
      s"${i * 47} ${i * 53} ${i * 59} ${i * 61} ${i * 67} ${i * 71}")
    assert(wave(in, target, ckpt, (1L to 12L).map(mk)) == 12L)
    assert(wave(in, target, ckpt, (21L to 32L).map(mk)) == 12L)

    def parquetFiles(dir: java.io.File): Long =
      if (dir.isDirectory) dir.listFiles().map(parquetFiles).sum
      else if (dir.getName.endsWith(".parquet")) 1L else 0L
    val bandsDir = new java.io.File(s"$target/bands")
    val total = parquetFiles(bandsDir)
    assert(total >= 4L, s"expected a multi-bucket bands plane, got $total files")

    // replicate the sink's probe spelling for ONE bucket: the scan must
    // read only that bucket's files, not the plane
    val probe = spark.read.parquet(s"$target/bands")
      .where(col("__bb").isin(0L))
    probe.collect()
    val scans = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val buf = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
      def go(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec        => go(q.plan)
        case s: FileSourceScanExec    => buf += s
        case other                    => other.children.foreach(go)
      }
      go(probe.queryExecution.executedPlan); buf.toSeq
    }
    assert(scans.nonEmpty)
    val scanned = scans.map(_.metrics("numFiles").value).max
    assert(scanned < total,
      s"probe read $scanned of $total bands files — partition pruning is not happening")
  }

  test("mismatched band geometry is rejected instead of silently losing recall") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, baseA))) == 1L) // records geometry
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.nearDupAppendSink(spark,
        spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in.toString),
        "doc_id", "text", target,
        Files.createTempDirectory("graft-nd-ckpt-geo").toString,
        bands = 16, nBuckets = 8) // bands differ from the recorded 8
    }
    assert(ex.getMessage.contains("geometry"))
    // bootstrap into a target another geometry built must also refuse
    val ex2 = intercept[IllegalArgumentException] {
      StreamingIngest.bootstrapNearDupTarget(spark,
        Seq((9L, baseB)).toDF("doc_id", "text"), "doc_id", "text", target,
        nBuckets = 32)
    }
    assert(ex2.getMessage.contains("empty target") ||
      ex2.getMessage.contains("geometry"))
  }

  test("bootstrapped corpus planes dedup subsequent sink waves") {
    val (in, target, ckpt) = freshDirs()
    // bootstrap from a batch corpus (no streaming, no markers)
    assert(StreamingIngest.bootstrapNearDupTarget(spark,
      Seq((1L, baseA), (2L, baseB)).toDF("doc_id", "text"),
      "doc_id", "text", target, nBuckets = 8) == 2L)
    assert(servedIds(target) == Seq(1L, 2L))
    // a first sink wave must probe the bootstrapped planes: exact and
    // near copies of corpus docs dropped, the new doc kept
    val appended = wave(in, target, ckpt, Seq(
      (10L, baseA), (11L, nearA),
      (12L, "a brand new post-bootstrap document about streaming sinks " +
        "markers planes buckets probes partitions and verified drops")))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 2L, 12L))
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

  // a short doc quoted WHOLE inside a long stored doc: containment = 1.0,
  // Jaccard ≈ |A|/|B| ≈ 0.2 — the LSH planes structurally keep it
  private val quoted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val longDoc = ("an extended opening paragraph with many original " +
    "tokens diluting similarity before the quotation begins " + quoted +
    " and a long original tail follows the quote with still more filler " +
    "tokens so the symmetric jaccard of the pair stays tiny forever")

  private def waveC(in: java.nio.file.Path, target: String, ckpt: String,
                    rows: Seq[(Long, String)]): Long = {
    if (rows.nonEmpty)
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
    StreamingIngest.nearDupAppendSink(spark,
      spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in.toString),
      "doc_id", "text", target, ckpt, nBuckets = 8,
      minContainment = Some(0.9))
  }

  test("containment tier drops a quoted-whole doc that Jaccard alone keeps") {
    // control: WITHOUT the containment tier the quoted doc is appended
    // (no band collision at jaccard ~0.2) — the gap being closed
    locally {
      val (in, target, ckpt) = freshDirs()
      assert(wave(in, target, ckpt, Seq((1L, longDoc))) == 1L)
      assert(wave(in, target, ckpt, Seq((2L, quoted))) == 1L)
      assert(servedIds(target) == Seq(1L, 2L))
    }
    // with minContainment: the same wave is dropped by the shingle-plane
    // probe; a genuinely new doc in the same batch still lands
    val (in, target, ckpt) = freshDirs()
    assert(waveC(in, target, ckpt, Seq((1L, longDoc))) == 1L)
    val appended = waveC(in, target, ckpt, Seq(
      (2L, quoted),
      (3L, "a separate novel document about watermark semantics and " +
        "stateful aggregation operators in structured streaming engines")))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 3L))
  }

  test("containment tier resolves within-batch quotes and bootstrapped corpora") {
    val (in, target, ckpt) = freshDirs()
    // bootstrap WITH containment planes
    assert(StreamingIngest.bootstrapNearDupTarget(spark,
      Seq((1L, longDoc)).toDF("doc_id", "text"),
      "doc_id", "text", target, nBuckets = 8,
      minContainment = Some(0.9)) == 1L)
    // wave: 20 is quoted inside 21 WITHIN the batch (within-batch
    // containment drop), 22 is quoted inside the BOOTSTRAPPED doc
    val other = "totally fresh sentences about executor memory spill " +
      "boundaries and shuffle partition sizing at large scale factors " +
      "with original vocabulary throughout the entire body"
    val appended = waveC(in, target, ckpt, Seq(
      (20L, "totally fresh sentences about executor memory spill"),
      (21L, other),
      (22L, quoted)))
    assert(appended == 1L)
    assert(servedIds(target) == Seq(1L, 21L))
    // and the within-batch survivor's planes are live: replaying its
    // quote in a later wave is dropped by the corpus probe
    assert(waveC(in, target, ckpt, Seq(
      (30L, "boundaries and shuffle partition sizing at large scale factors"))) == 0L)
    assert(servedIds(target) == Seq(1L, 21L))
  }

  test("containment geometry is part of the target contract") {
    val (in, target, ckpt) = freshDirs()
    assert(waveC(in, target, ckpt, Seq((1L, baseA))) == 1L)
    // re-entering WITHOUT the containment tier must fail loudly — its
    // probes would silently skip the containment planes
    val ex = intercept[IllegalArgumentException] {
      wave(in, target, Files.createTempDirectory("graft-nd-ckpt2").toString,
        Seq.empty)
    }
    assert(ex.getMessage.contains("geometry"))
  }
}
