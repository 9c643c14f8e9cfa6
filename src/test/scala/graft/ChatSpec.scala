package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Chat

class ChatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("flattenTurns: messages parse in order; malformed JSON contributes no rows; missing fields stay NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, """[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]"""),
      (2L, "not json at all"),
      (3L, """[{"role":"user"}]""")).toDF("id", "messages")
    val got = Chat.flattenTurns(df, "messages", keepCols = Seq("id"))
      .orderBy("id", "turn_idx").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 1L, 3L))
    assert(got(0).getString(2) == "user" && got(0).getString(3) == "hi")
    assert(got(1).getString(2) == "assistant" && got(1).getString(3) == "yo")
    assert(got(2).getString(2) == "user" && got(2).isNullAt(3),
      "a turn without content keeps a NULL content, not a dropped row")
  }

  test("assistantSpans: spans tile the rendered conversation exactly; loss marks assistant turns") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0, "user", "ab"), (1L, 1, "assistant", "cdef"),
      (1L, 2, "user", "g")).toDF("id", "turn_idx", "role", "content")
    val got = Chat.assistantSpans(turns, "id").orderBy("turn_idx").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // rendered: "<|user|>ab\n" (11) + "<|assistant|>cdef\n" (18) + "<|user|>g\n" (10)
    assert(got.toSeq == Seq((0L, 11L, false), (11L, 29L, true), (29L, 39L, false)))
    // spans tile: each start equals the previous end, first starts at 0
    val rendered = "<|user|>ab\n<|assistant|>cdef\n<|user|>g\n"
    assert(got.last._2 == rendered.length.toLong)
    assert(rendered.substring(11, 29) == "<|assistant|>cdef\n",
      "the loss span cut out of the rendered string is exactly the assistant turn")
  }

  test("assistantSpans: a NULL-content turn renders as the bare skeleton — later spans do NOT shift") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0, "user", null.asInstanceOf[String]),
      (1L, 1, "assistant", "hi")).toDF("id", "turn_idx", "role", "content")
    val got = Chat.assistantSpans(turns, "id").orderBy("turn_idx").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    // "<|user|>\n" = 9 chars; "<|assistant|>hi\n" = 16
    assert(got.toSeq == Seq((0L, 9L), (9L, 25L)),
      "the missing-content turn contributes its skeleton length, not a NULL hole")
  }

  test("sftStats: hand-computed budgeting numbers; empty assistant content counts zero tokens") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0, "user", "one two"), (1L, 1, "assistant", "three four five"),
      (2L, 0, "user", "x"), (2L, 1, "assistant", "")).toDF(
      "id", "turn_idx", "role", "content")
    val got = Chat.sftStats(turns, "id").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // id 1: rendered = "<|user|>one two\n"(16) + "<|assistant|>three four five\n"(29)
    assert(got(0) == ((1L, 2L, 1L, 45L, 29L, 3L)))
    // id 2: "<|user|>x\n"(10) + "<|assistant|>\n"(14); empty content -> 0 tokens
    assert(got(1) == ((2L, 2L, 1L, 24L, 14L, 0L)))
  }
}
