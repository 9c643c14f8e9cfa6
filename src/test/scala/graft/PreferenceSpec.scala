package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Preference

class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pairHygiene: degenerate/empty flags, NULL sides, clean-min-id survivor per prompt group") {
    import spark.implicits._
    val pairs = Seq(
      // prompt group "P": id 1 is DEGENERATE (chosen==rejected after
      // normalization), id 2 is clean — the group survivor must be 2,
      // not nothing
      (1L, "P", "Same  Text", "same text"),
      (2L, "P", "good answer", "bad answer"),
      (3L, "P", "another good", "another bad"),
      // NULL rejected → empty_side, never degenerate
      (4L, "Q", "a", null),
      // whitespace-only chosen → empty_side
      (5L, "R", "   ", "b")).toDF("id", "prompt", "chosen", "rejected")
    val got = Preference.pairHygiene(pairs, "id", "prompt", "chosen", "rejected")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("degenerate"),
        r.getAs[Boolean]("empty_side"), r.getAs[Long]("prompt_dups"),
        r.getAs[Boolean]("keep")))
    assert(got(0) == ((1L, true, false, 3L, false)),
      "case/whitespace-normalized equality is degenerate")
    assert(got(1) == ((2L, false, false, 3L, true)),
      "the min-id CLEAN pair survives even when a smaller id is degenerate")
    assert(got(2) == ((3L, false, false, 3L, false)))
    assert(got(3) == ((4L, false, true, 1L, false)), "NULL side is empty, not degenerate")
    assert(got(4) == ((5L, false, true, 1L, false)))
  }

  test("pairHygiene: empty/NULL prompts flag no_prompt and are never dedup survivors") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "", "good a", "bad a"),
      (2L, "   ", "good b", "bad b"),
      (3L, null.asInstanceOf[String], "good c", "bad c"),
      (4L, "real prompt", "good d", "bad d")).toDF(
      "id", "prompt", "chosen", "rejected")
    val got = Preference.pairHygiene(pairs, "id", "prompt", "chosen", "rejected")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("no_prompt"),
        r.getAs[Boolean]("keep")))
    assert(got.toSeq == Seq((1L, true, false), (2L, true, false),
      (3L, true, false), (4L, false, true)),
      "promptless pairs must not be collapsed into one md5-of-empty survivor")
  }

  test("lengthBias: exact totals and fractions over COMPARED pairs only") {
    import spark.implicits._
    val pairs = Seq(
      ("one two three", "one"), ("a", "b c"), ("x y", "z w")).toDF("chosen", "rejected")
    val r = Preference.lengthBias(pairs, "chosen", "rejected").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 6L &&
      r.getLong(3) == 5L && r.getLong(4) == 1L)
    assert(r.getDouble(5) == 2.0 && math.abs(r.getDouble(7) - 0.333333) < 1e-9)
    // NULL-sided pairs leave the compared population instead of
    // deflating the means and capping the fraction
    val withNulls = Seq(
      ("one two three four", "one"),
      (null.asInstanceOf[String], "x"),
      ("a b", null.asInstanceOf[String])).toDF("chosen", "rejected")
    val n = Preference.lengthBias(withNulls, "chosen", "rejected").head()
    assert(n.getLong(0) == 3L && n.getLong(1) == 1L)
    assert(n.getDouble(5) == 4.0 && n.getDouble(7) == 1.0,
      "one compared pair, chosen longer — the fraction must be 1.0, not 1/3")
  }

  test("bradleyTerry: 3:1 head-to-head lands at the exact 1:1/3 solution; zero-win item at 0; junk filtered") {
    import spark.implicits._
    // a beats b 3:1 → BT solution π_a : π_b = 3 : 1 (max-normalized:
    // 1 and 1/3); self-comparisons and NULL sides carry no signal
    val o = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a"),
      ("a", "a"), (null.asInstanceOf[String], "b")))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(o, "winner", "loser")
      .orderBy("item").collect()
    assert(got.length == 2)
    val a = got(0); val b = got(1)
    assert(a.getString(0) == "a" && a.getLong(1) == 3L && a.getLong(2) == 4L)
    assert(b.getString(0) == "b" && b.getLong(1) == 1L && b.getLong(2) == 4L)
    assert(a.getDouble(4) == 1.0, s"top item must sit at exactly SCALE: $a")
    assert(math.abs(b.getDouble(4) - 1.0 / 3.0) < 1e-9, s"π_b: $b")
    // transitive sweep: the item that never wins lands at exactly 0
    val chain = (Seq.fill(2)(("a", "b")) ++ Seq.fill(2)(("b", "c")) ++
      Seq.fill(2)(("a", "c"))).toDF("winner", "loser")
    val c3 = Preference.bradleyTerry(chain, "winner", "loser")
      .orderBy("item").collect()
    assert(c3(0).getDouble(4) == 1.0)
    assert(c3(1).getDouble(4) > 0.0 && c3(1).getDouble(4) < 1.0)
    assert(c3(2).getDouble(4) == 0.0 && c3(2).getLong(3) == 0L,
      s"zero-win item must land at exactly 0: ${c3(2)}")
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(o, "winner", "loser", iterations = 0)
    }
  }
}
