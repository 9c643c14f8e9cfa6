package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.streaming.StreamingIngest

/** Streaming incremental sessionization on plain parquet
  * ([[StreamingIngest.sessionSink]]): folding micro-batches into the
  * open/closed session planes must equal batch
  * [[EventOps.sessionStats]] over the full history — including sessions
  * SPANNING a batch boundary — skip replays, ignore torn version
  * directories, and reject time-traveling events loudly.
  */
class SessionSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val gapUs = 1000L // 1 ms gap for compact fixtures
  private val nBuckets = 8

  private def freshDirs(): (java.nio.file.Path, String, String) = (
    java.nio.file.Files.createTempDirectory("graft-sess-in"),
    java.nio.file.Files.createTempDirectory("graft-sess-tgt").toString,
    java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString)

  /** (user, us, event_id, value) */
  private type Ev = (Long, Long, Long, Double)

  private def wave(in: java.nio.file.Path, target: String, ckpt: String,
                   rows: Seq[Ev]): Long = {
    if (rows.nonEmpty)
      rows.toDF("user_id", "us", "event_id", "value").coalesce(1)
        .write.mode("append").parquet(in.toString)
    StreamingIngest.sessionSink(spark,
      spark.readStream
        .schema("user_id BIGINT, us BIGINT, event_id BIGINT, value DOUBLE")
        .parquet(in.toString),
      "user_id", "us", "event_id", "value", gapUs, target, ckpt,
      nBuckets = nBuckets, keepVersions = 2)
  }

  private def served(target: String) =
    StreamingIngest.readSessionTarget(spark, target)
      .select("user_id", "session_seq", "start_us", "end_us",
        "duration_us", "n_events", "sum_value", "is_open")
      .as[(Long, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(t => (t._1, t._2)).toSeq

  private def batchRef(rows: Seq[Ev]) =
    EventOps.sessionStats(
      rows.toDF("user_id", "us", "event_id", "value"),
      "user_id", "us", "event_id", "value", gapUs)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(t => (t._1, t._2)).toSeq

  test("mid-session split: streaming folds == batch sessionStats; " +
    "boundary-spanning session merges, ids stay deterministic") {
    val (in, target, ckpt) = freshDirs()
    // user 1: session A (0,100,200), session B spans the batch
    //   boundary (5000,5100 | 5200,5300), session C (20000)
    // user 2: one session entirely in batch 1, a NEW session in batch 2
    //   (boundary gap >= gapUs closes the open one)
    val b1: Seq[Ev] = Seq(
      (1L, 0L, 1L, 1.5), (1L, 100L, 2L, 2.25), (1L, 200L, 3L, 0.0),
      (1L, 5000L, 4L, 4.0), (1L, 5100L, 5L, 1.0),
      (2L, 0L, 6L, 10.0), (2L, 500L, 7L, 0.125))
    val b2: Seq[Ev] = Seq(
      (1L, 5200L, 8L, 2.0), (1L, 5300L, 9L, 3.0), (1L, 20000L, 10L, 7.0),
      (2L, 9000L, 11L, 5.0))
    assert(wave(in, target, ckpt, b1) == 1L)
    assert(wave(in, target, ckpt, b2) == 1L)
    val got = served(target)
    val ref = batchRef(b1 ++ b2)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)) == ref,
      s"streaming $got != batch $ref")
    // exactly each user's LAST session is open
    val lastSeq = ref.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    got.foreach(t => assert(t._8 == (lastSeq(t._1) == t._2),
      s"is_open wrong for $t"))
    // replay / empty input: nothing applied, state unchanged
    assert(wave(in, target, ckpt, Seq.empty) == 0L)
    assert(served(target) == got)
  }

  test("single-batch parity: one wave == batch sessionStats, all open/closed flags right") {
    val (in, target, ckpt) = freshDirs()
    val b: Seq[Ev] = Seq(
      (7L, 0L, 1L, 1.0), (7L, 10L, 2L, 2.0),
      (7L, 5000L, 3L, 3.0), (8L, 42L, 4L, 0.5))
    assert(wave(in, target, ckpt, b) == 1L)
    val got = served(target)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)) ==
      batchRef(b))
    // user 7's first session is closed (a later event closed it),
    // its second and user 8's only session are open
    assert(got.map(t => (t._1, t._2) -> t._8).toMap ==
      Map((7L, 1L) -> false, (7L, 2L) -> true, (8L, 1L) -> true))
  }

  test("torn version directories are invisible; crashed attempts are replaced") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt,
      Seq((1L, 0L, 1L, 1.0), (1L, 5000L, 2L, 2.0))) == 1L)
    val before = served(target)
    // torn OPEN version + torn CLOSED batch dir, neither committed
    val b = java.nio.file.Files.list(
      java.nio.file.Paths.get(target, "open")).toArray
      .map(_.toString).filter(_.split("/").last.startsWith("b")).head
    val tornOpen = java.nio.file.Paths.get(b, "v999")
    java.nio.file.Files.createDirectories(tornOpen)
    java.nio.file.Files.writeString(tornOpen.resolve("junk.txt"), "x")
    val tornClosed = java.nio.file.Paths.get(target, "closed", "v999")
    java.nio.file.Files.createDirectories(tornClosed)
    java.nio.file.Files.writeString(tornClosed.resolve("junk.txt"), "x")
    assert(served(target) == before)
  }

  test("crashed-attempt leftovers (renamed but unmarked) are replaced by the committing batch") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, 0L, 1L, 1.0))) == 1L)
    // simulate a batch-1 attempt that renamed its version dirs in but
    // died before the commit marker: junk must be ignored by readers
    // and REPLACED (not nested into) by the real batch 1
    val openB = java.nio.file.Files.list(
      java.nio.file.Paths.get(target, "open")).toArray
      .map(_.toString).filter(_.split("/").last.startsWith("b")).head
    val staleOpen = java.nio.file.Paths.get(openB, "v1")
    java.nio.file.Files.createDirectories(staleOpen)
    java.nio.file.Files.writeString(staleOpen.resolve("junk.txt"), "x")
    val staleClosed = java.nio.file.Paths.get(target, "closed", "v1")
    java.nio.file.Files.createDirectories(staleClosed)
    java.nio.file.Files.writeString(staleClosed.resolve("junk.txt"), "x")
    val before = served(target)
    assert(before == served(target))
    // real batch 1: gap passed -> session 1 closes, session 2 opens
    assert(wave(in, target, ckpt, Seq((1L, 50000L, 2L, 2.0))) == 1L)
    val got = served(target)
    assert(got.map(t => (t._1, t._2, t._8)) ==
      Seq((1L, 1L, false), (1L, 2L, true)), s"after replay: $got")
    assert(!java.nio.file.Files.exists(staleOpen.resolve("junk.txt")),
      "crashed-attempt open leftovers must be deleted by the commit")
    assert(!java.nio.file.Files.exists(staleClosed.resolve("junk.txt")),
      "crashed-attempt closed leftovers must be deleted by the commit")
  }

  test("compactSessionTarget: folds the closed plane row-identically; " +
    "idempotent; torn mid-swap compaction rolls forward on the next run") {
    val (in, target, ckpt) = freshDirs()
    // 4 waves 10ms apart: every wave from the 2nd on closes each user's
    // previous session -> 3 closed/v* dirs accumulate
    val allRows = (0 until 4).map { w =>
      (1L to 5L).map(u => (u, w * 10000L, w * 100L + u, 1.0)): Seq[Ev]
    }
    allRows.foreach(rows => assert(wave(in, target, ckpt, rows) == 1L))
    def closedVDirs() = java.nio.file.Files.list(
      java.nio.file.Paths.get(target, "closed")).toArray
      .map(_.toString.split("/").last).filter(_.startsWith("v")).sorted
    val before = served(target)
    val n0 = closedVDirs().length
    assert(n0 == 3, s"fixture must accumulate closed dirs: ${closedVDirs().toSeq}")
    assert(StreamingIngest.compactSessionTarget(spark, target) == 3)
    assert(closedVDirs().length == 1, closedVDirs().toSeq.toString)
    assert(served(target) == before, "compaction must be row-identical")
    // idempotent: a second run is a no-op
    assert(StreamingIngest.compactSessionTarget(spark, target) == 0)
    assert(served(target) == before)
    // two more waves re-grow the plane, then a TORN compaction: tmp
    // written, plan recorded, one source renamed aside — crash before
    // the swap finished
    assert(wave(in, target, ckpt,
      (1L to 5L).map(u => (u, 40000L, 400L + u, 1.0))) == 1L)
    assert(wave(in, target, ckpt,
      (1L to 5L).map(u => (u, 50000L, 500L + u, 1.0))) == 1L)
    val before2 = served(target)
    val vs = closedVDirs().map(_.stripPrefix("v").toLong).sorted
    assert(vs.length == 3, vs.toSeq.toString)
    val tmp = java.nio.file.Paths.get(target, "_graft_session_closed_ctmp")
    spark.read.parquet(vs.map(v => s"$target/closed/v$v"): _*)
      .coalesce(1).write.parquet(tmp.toString)
    java.nio.file.Files.deleteIfExists(tmp.resolve("_SUCCESS"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target, "_graft_session_compact_plan"),
      s"dest=${vs.max};src=${vs.mkString(",")}")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(target, "closed", s"v${vs.min}"),
      java.nio.file.Paths.get(target, "closed",
        s"_graft_compact_old_closed_v${vs.min}"))
    // the next run recovers (rolls the recorded plan forward), then has
    // nothing further to fold
    assert(StreamingIngest.compactSessionTarget(spark, target) == 0)
    assert(closedVDirs().length == 1, closedVDirs().toSeq.toString)
    assert(served(target) == before2,
      "post-recovery reads must be row-identical")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(target, "_graft_session_compact_plan")))
    assert(!java.nio.file.Files.exists(tmp))
    // streaming == batch on the compacted target
    assert(served(target)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)) ==
      batchRef(allRows.flatten ++
        (1L to 5L).map(u => (u, 40000L, 400L + u, 1.0)) ++
        (1L to 5L).map(u => (u, 50000L, 500L + u, 1.0))))
  }

  test("compactSessionTarget: a TORN PLAN (crash mid-plan-write) heals " +
    "as no-plan — the next run deletes it and compacts normally") {
    val (in, target, ckpt) = freshDirs()
    val allRows = (0 until 3).map { w =>
      (1L to 5L).map(u => (u, w * 10000L, w * 100L + u, 1.0)): Seq[Ev]
    }
    allRows.foreach(rows => assert(wave(in, target, ckpt, rows) == 1L))
    val before = served(target)
    // a plan whose write tore mid-stream: src= segment truncated — the
    // old parse (split(";")(1).toLong) threw here on EVERY run, wedging
    // the compactor for good
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target, "_graft_session_compact_plan"),
      "dest=4;sr")
    assert(StreamingIngest.compactSessionTarget(spark, target) == 2,
      "torn plan must heal as no-plan and the compaction proceed")
    assert(served(target) == before, "reads must stay row-identical")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(target, "_graft_session_compact_plan")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      target, "_graft_session_compact_plan.inprogress")),
      "the atomic-write temp must not linger")
  }

  test("out-of-order cross-batch event raises instead of mis-sessionizing") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, 10000L, 1L, 1.0))) == 1L)
    val e = intercept[Exception] {
      wave(in, target, ckpt, Seq((1L, 500L, 2L, 1.0)))
    }
    assert(e.getMessage != null)
  }

  test("12-wave churn over many users == one batch sessionStats; " +
    "open-bucket retention bounded") {
    val (in, target, ckpt) = freshDirs()
    val all = scala.collection.mutable.ArrayBuffer.empty[Ev]
    var eid = 0L
    var clock = 0L
    for (w <- 1 to 12) {
      // every wave advances the global clock; every 3rd wave jumps past
      // the gap so sessions both span and break across batch boundaries
      clock += (if (w % 3 == 0) 50000L else 400L)
      val rows = (0 until 6).map { j =>
        eid += 1
        val u = ((w + j) % 4).toLong
        val us = clock + j * 10L
        (u, us, eid, (j + 1) * 0.25)
      }.sortBy(_._2)
      all ++= rows
      assert(wave(in, target, ckpt, rows) == 1L)
    }
    val got = served(target)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)) ==
      batchRef(all.toSeq), "12-wave fold must equal one batch pass")
    // retention: every open bucket holds <= keepVersions version dirs
    java.nio.file.Files.list(java.nio.file.Paths.get(target, "open"))
      .forEach { bkt =>
        if (bkt.getFileName.toString.startsWith("b")) {
          val n = java.nio.file.Files.list(bkt).toArray
            .map(_.toString.split("/").last).count(_.startsWith("v"))
          assert(n <= 2, s"bucket $bkt holds $n versions (keepVersions=2)")
        }
      }
  }

  test("as-of view closure: open sessions past their inactivity gap read closed") {
    val (in, target, ckpt) = freshDirs()
    // user 1's session ends at 5100; user 2's at 500 (gapUs = 1000)
    assert(wave(in, target, ckpt, Seq(
      (1L, 5000L, 1L, 1.0), (1L, 5100L, 2L, 2.0), (2L, 500L, 3L, 3.0))) == 1L)
    def opens(asOf: Option[Long]) =
      StreamingIngest.readSessionTarget(spark, target, asOf)
        .filter(col("is_open")).select("user_id")
        .as[Long].collect().toSet
    assert(opens(None) == Set(1L, 2L), "no clock: both latest sessions open")
    // at 5500: user 2's gap (500+1000 <= 5500) has passed, user 1's
    // (5100+1000 > 5500) has not
    assert(opens(Some(5500L)) == Set(1L))
    // boundary: end + gap == asOf closes (no event can extend it)
    assert(opens(Some(6100L)) == Set.empty[Long])
    // the stored state is untouched — a later event still closes
    // physically with the right session id
    assert(wave(in, target, ckpt, Seq((1L, 99000L, 4L, 1.0))) == 1L)
    val seqs = StreamingIngest.readSessionTarget(spark, target)
      .filter(col("user_id") === 1L).select("session_seq", "is_open")
      .as[(Long, Boolean)].collect().toSet
    assert(seqs == Set((1L, false), (2L, true)), s"seqs: $seqs")
  }

  test("mismatched geometry is rejected at entry") {
    val (in, target, ckpt) = freshDirs()
    assert(wave(in, target, ckpt, Seq((1L, 0L, 1L, 1.0))) == 1L)
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.sessionSink(spark,
        spark.readStream
          .schema("user_id BIGINT, us BIGINT, event_id BIGINT, value DOUBLE")
          .parquet(in.toString),
        "user_id", "us", "event_id", "value", gapUs * 2, target,
        java.nio.file.Files.createTempDirectory("graft-sess-ckpt2").toString,
        nBuckets = nBuckets)
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)
  }
}
