package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's round-over-round guard ([[Bench.parsePrevQueries]] /
  * [[Bench.vsPrevJson]]): the comparison must cover only common queries,
  * name real regressions, exclude failed sentinels, and degrade to None on
  * a missing or old-format prior instead of failing the sweep.
  */
class BenchVsPrevSpec extends AnyFunSuite {

  test("parsePrevQueries reads the per-query map and degrades gracefully") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-prev")
    val f = dir.resolve("last_run.json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":3.5,"queries":{"q1":1.25,"q2":2.25,"q3":-1.0}}""")
    assert(Bench.parsePrevQueries(f) ==
      Some(Map("q1" -> 1.25, "q2" -> 2.25, "q3" -> -1.0)))
    // missing file, malformed JSON, old format without "queries": all None
    assert(Bench.parsePrevQueries(dir.resolve("absent.json")).isEmpty)
    java.nio.file.Files.writeString(f, "{not json")
    assert(Bench.parsePrevQueries(f).isEmpty)
    java.nio.file.Files.writeString(f, """{"metric":"total","value":3.5}""")
    assert(Bench.parsePrevQueries(f).isEmpty)
  }

  test("vsPrevJson compares common queries only and names real regressions") {
    import org.json4s._
    val cur = Map(
      "q1" -> 1.0,   // unchanged
      "q2" -> 2.0,   // regression: 4x and +1.5s
      "q3" -> 0.05,  // 5x but sub-0.3s absolute: jitter, not named
      "q5" -> 9.0,   // new this round: excluded from totals
      "q6" -> -1.0)  // failed this round: excluded
    val prev = Map(
      "q1" -> 1.0,
      "q2" -> 0.5,
      "q3" -> 0.01,
      "q4" -> 7.0,   // removed this round: excluded
      "q6" -> 1.0)
    val j = org.json4s.jackson.JsonMethods.parse(Bench.vsPrevJson(cur, prev))
    assert((j \ "n_common") == JInt(3))
    assert((j \ "prev_total_common") == JDouble(1.51))
    assert((j \ "cur_total_common") == JDouble(3.05))
    val regs = (j \ "regressions").asInstanceOf[JObject].obj.map(_._1)
    assert(regs == List("q2"), s"expected only q2 named, got $regs")
    assert((j \ "regressions" \ "q2" \ "prev") == JDouble(0.5))
    assert((j \ "regressions" \ "q2" \ "cur") == JDouble(2.0))
  }

  test("vsPrevJson with zero overlap reports ratio -1 instead of dividing") {
    val j = org.json4s.jackson.JsonMethods.parse(
      Bench.vsPrevJson(Map("a" -> 1.0), Map("b" -> 1.0)))
    import org.json4s._
    assert((j \ "n_common") == JInt(0))
    assert((j \ "ratio") == JDouble(-1.0))
  }
}
