package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.FileChecks

class FileChecksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exists/empty/size/age/utf8 checks over a glob") {
    val dir = Files.createTempDirectory("graft-filechecks")
    Files.writeString(dir.resolve("good.csv"), "a,b\n1,2\n")
    Files.write(dir.resolve("empty.csv"), Array.empty[Byte])
    Files.write(dir.resolve("binary.csv"), Array[Byte](0xC3.toByte, 0x28, 0x41, 0x42))
    val s = FileChecks.check(spark, s"$dir/*.csv")
    assert(s.files.size == 3)
    val byName = s.files.map(f => f.path.split('/').last -> f).toMap
    assert(byName("good.csv").utf8Ok && !byName("good.csv").empty)
    assert(byName("empty.csv").empty)
    assert(!byName("binary.csv").utf8Ok) // 0xC3 0x28 is invalid UTF-8
    assert(s.failed)
  }

  test("missing glob reports not-exists and fails") {
    val s = FileChecks.check(spark, "/tmp/definitely-not-here-*.csv")
    assert(!s.files.head.exists && s.failed)
  }

  test("stale and large warnings honor thresholds") {
    val dir = Files.createTempDirectory("graft-filechecks2")
    val f = dir.resolve("old.csv")
    Files.writeString(f, "x\n1\n")
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(now - 10L * 24 * 3600 * 1000))
    val s = FileChecks.check(spark, s"$dir/*.csv", maxSizeBytes = 1L, maxAgeDays = 7, nowMs = now)
    assert(s.files.head.largeWarn && s.files.head.staleWarn)
    assert(!s.failed) // warnings do not fail the gate
  }

  test("archive moves processed files to the processed dir") {
    val dir = Files.createTempDirectory("graft-archive")
    Files.writeString(dir.resolve("a.csv"), "x\n1\n")
    Files.writeString(dir.resolve("b.csv"), "x\n2\n")
    val moved = FileChecks.archive(spark, s"$dir/*.csv", s"$dir/processed")
    assert(moved.size == 2)
    assert(!Files.exists(dir.resolve("a.csv")))
    assert(Files.exists(Paths.get(s"$dir/processed/a.csv")))
  }

  test("sense succeeds immediately when the input already exists") {
    val dir = Files.createTempDirectory("graft-sense1")
    Files.writeString(dir.resolve("in.csv"), "x\n1\n")
    var slept = 0
    val pokes = FileChecks.sense(spark, s"$dir/*.csv",
      pokeIntervalMs = 60000L, timeoutMs = 300000L,
      sleep = _ => slept += 1)
    assert(pokes == 1 && slept == 0) // first poke hits, no sleeping
  }

  test("sense keeps poking until the file appears") {
    val dir = Files.createTempDirectory("graft-sense2")
    var now = 0L
    var slept = 0
    val pokes = FileChecks.sense(spark, s"$dir/*.csv",
      pokeIntervalMs = 60000L, timeoutMs = 300000L,
      clock = () => now,
      sleep = ms => {
        now += ms; slept += 1
        if (slept == 2) Files.writeString(dir.resolve("late.csv"), "x\n1\n")
      })
    assert(pokes == 3 && slept == 2) // two misses, file lands, third poke hits
  }

  test("sense times out when the file never appears (Airflow timeout=300s parity)") {
    val dir = Files.createTempDirectory("graft-sense3")
    var now = 0L
    val e = intercept[FileChecks.SensorTimeoutException] {
      FileChecks.sense(spark, s"$dir/*.csv",
        pokeIntervalMs = 60000L, timeoutMs = 300000L,
        clock = () => now,
        sleep = ms => now += ms)
    }
    // poke at t=0..240s all miss; at t=300s the timeout gate fires: 6 pokes
    assert(e.getMessage.contains("6 pokes"))
  }

  test("GraftExtensions makes native functions available in plain SQL") {
    val base = SparkTestSession.spark // ensure context exists
    // getOrCreate returns the active session (ignoring withExtensions), so
    // clear active/default first to force a NEW session whose state is
    // built from the extensions, then restore the shared one.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master(base.sparkContext.master)
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      val r = s2.sql(
        "SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "graft_simhash64(graft_shingle_hashes(array('a','b','c'), 1)) AS sh")
        .head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) != 0L)
      // round-6 injections: affine mat-vec and BPE from plain SQL
      val r2 = s2.sql(
        "SELECT graft_mat_vec_affine(array(1.0d, 2.0d), " +
          "array(array(1.0d, 1.0d), array(0.0d, 3.0d)), array(0.0d, 1.0d)) AS mv, " +
          "graft_bpe_encode(array('hug'), array('u g', 'h ug')) AS toks, " +
          "graft_bpe_merge_pair(array('h','u','g'), 'u', 'g') AS merged")
        .head()
      assert(r2.getSeq[Double](0).toList == List(3.0, 5.0))
      assert(r2.getSeq[String](1).toList == List("hug"))
      assert(r2.getSeq[String](2).toList == List("h", "ug"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
