package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-21 optimization invariants: the per-row codegen kernels that
  * replaced the exploded gram/fingerprint planes (ChrfGramStats,
  * BleuGramStats, WinnowFingerprints) must reproduce the distributed
  * spellings' exact integers on the inputs that distinguish the two —
  * multi-byte code points (positions are CODE POINTS, not bytes or
  * UTF-16 units), separator collisions, and tie rules.
  */
class Round21Props extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference chrF counts: the exploded spelling's logic in plain
    * Scala over code points — substring grams, multiset clip.
    */
  private def refChrf(cand: String, ref: String,
                      maxN: Int): Seq[(Long, Long, Long)] = {
    def cps(s: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val n = Character.charCount(s.codePointAt(i))
        b += s.substring(i, i + n)
        i += n
      }
      b.result()
    }
    val c = cps(cand); val r = cps(ref)
    (1 to maxN).map { n =>
      val cg = c.sliding(n).filter(_.size == n).map(_.mkString).toSeq
      val rg = r.sliding(n).filter(_.size == n).map(_.mkString).toSeq
      val rc = scala.collection.mutable.Map.empty[String, Int]
      rg.foreach(g => rc(g) = rc.getOrElse(g, 0) + 1)
      var m = 0L
      cg.foreach { g =>
        // clip: Σ_g min(count_c, count_r), consumed candidate-side
        if (rc.getOrElse(g, 0) > 0) { rc(g) -= 1; m += 1 }
      }
      (m, cg.size.toLong, rg.size.toLong)
    }
  }

  test("ChrfGramStats counts code points, not UTF-16 units: emoji and " +
    "CJK grams match the reference clip exactly") {
    val rows = Seq(
      ("😀ab😀", "ab😀😀"),
      ("漢字かな交じり文", "かな漢字文"),
      ("abcabc", "bcabca"),
      ("", "abc"))
    val df = rows.toDF("c", "r")
      .select(graft.functions.ArrayMath.chrfGramStats(col("c"), col("r"), 6)
        .as("st"), col("c"), col("r"))
    df.collect().foreach { row =>
      val c = row.getString(1); val r = row.getString(2)
      val got = row.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      assert(got == refChrf(c, r, 6), s"mismatch for ($c, $r)")
    }
  }

  test("BleuGramStats gram identity is the U+0001-joined string: a token " +
    "containing the separator collides exactly like the exploded spelling") {
    // exploded spelling: gram = concat_ws("", tokens) — so
    // ["ab"] and ["a","b"] produce the SAME 2-gram string "ab"
    // when the first is a 1-gram... the kernel must reproduce that
    // collision, not "fix" it
    val df = Seq((Seq("ab", "x"), Seq("a", "b"))).toDF("c", "r")
      .select(graft.functions.ArrayMath.bleuGramStats(col("c"), col("r"))
        .as("st"))
    val st = df.collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1)))
    // n=1: cand {ab, x} vs ref {a, b} — no match; n=2: cand gram
    // "abx" vs ref "ab" — no match BUT cand 1-gram
    // "ab" never enters n=2; verify totals and zero matches
    assert(st == Seq((0L, 2L), (0L, 1L), (0L, 0L), (0L, 0L)))
    // and the collision case: cand 1-gram == ref 2-gram never meet
    // (orders are counted separately) — but within one order they do:
    val df2 = Seq((Seq("ab"), Seq("a", "b"))).toDF("c", "r")
      .select(graft.functions.ArrayMath.bleuGramStats(col("c"), col("r"))
        .as("st"))
    val st2 = df2.collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(st2.head == (0L, 1L)) // 1-gram "ab" vs {a, b}: no match
    assert(st2(1) == (0L, 0L))   // cand has no 2-gram
  }

  test("WinnowFingerprints equals the SQL spelling on multi-byte text: " +
    "md5 over code-point grams, rightmost-min, full windows only") {
    val k = 8; val w = 4
    // includes 2- and 3-byte UTF-8 chars so byte offsets != char offsets
    val txt = "päällekkäisyys ja 漢字 winnowing test päällekkäisyys"
    val norm = txt.toLowerCase.replaceAll("\\s+", " ").trim
    // reference: the pre-kernel exploded spelling, built inline
    val ref = Seq(norm).toDF("t")
      .select(posexplode(sequence(lit(1),
        length(col("t")) - (k - 1))).as(Seq("d", "p")), col("t"))
      .select(col("p").cast("long").as("p"),
        conv(substring(md5(expr(s"substring(t, p, $k)")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .withColumn("sel", min_by(struct(col("p"), col("h")),
        struct(col("h"), (-col("p")).as("np"))).over(
          org.apache.spark.sql.expressions.Window.orderBy("p")
            .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
              w - 1)))
      .withColumn("wn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.orderBy("p")
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            w - 1)))
      .filter(col("wn") === w)
      .select(col("sel.p"), col("sel.h")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Seq(txt).toDF("text")
      .select(explode(graft.functions.ArrayMath.winnowFingerprints(
        graft.ops.TextOps.normalized(col("text")), k, w)).as("fp"))
      .select(col("fp.fp_pos"), col("fp.fp_hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref, s"kernel ${got.size} vs reference ${ref.size}")
    assert(got.nonEmpty)
  }

  test("WinnowFingerprints: short and NULL docs emit nothing; a hash tie " +
    "inside one window selects the rightmost position") {
    val out = Seq[(java.lang.Long, String)]((1L, "abcdefghij"),
      (2L, "abcdefgh"), (3L, null), (4L, "short"))
      .toDF("id", "t")
      .select(col("id"), explode(graft.functions.ArrayMath
        .winnowFingerprints(col("t"), 8, 4)).as("fp"))
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 1: 3 k-grams < w=4 → nothing; id 2: 1 k-gram → nothing
    assert(out.isEmpty)
    // identical k-grams everywhere → all hashes tie → rightmost of the
    // first full window wins, then every later window re-selects its own
    // rightmost — positions 4..n
    val tie = Seq("aaaaaaaaaaaaa").toDF("t") // 13 chars → 6 grams of k=8
      .select(explode(graft.functions.ArrayMath
        .winnowFingerprints(col("t"), 8, 4)).as("fp"))
      .select(col("fp.fp_pos")).collect().map(_.getLong(0)).toSeq.sorted
    assert(tie == Seq(4L, 5L, 6L), s"got $tie")
  }
}
