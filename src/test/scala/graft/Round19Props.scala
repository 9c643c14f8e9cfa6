package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Round-19 operator properties: Good–Turing, Chao1 richness, chrF and
  * Jensen–Shannon divergence against hand-computed closed forms.
  */
class Round19Props extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("goodTuring: hand-computed frequency-of-frequencies, adjusted " +
    "counts, NULL where the raw estimator is undefined") {
    import spark.implicits._
    // counts a:3 b:2 c:1 -> N=6; N_1=N_2=N_3=1
    val got = TextOps.goodTuring(
        Seq("a a a b b c").toDF("text"), "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, Some(2.0), Some(2.0 / 6.0))))    // 2*N2/N1
    assert(got(2L) == ((1L, Some(3.0), Some(3.0 / 6.0))))    // 3*N3/N2
    assert(got(3L) == ((1L, None, None)))                    // N4 = 0
  }

  test("vocabRichness: Chao1 and Good's coverage, hand-computed") {
    import spark.implicits._
    // g1: a:2 b:1 c:1 -> N=4 V=3 f1=2 f2=1
    //   chao1 = 3 + 2*1/(2*(1+1)) = 3.5, coverage = 1 - 2/4 = 0.5
    // g2: a:1 -> N=1 V=1 f1=1 f2=0
    //   chao1 = 1 + 1*0/2 = 1.0, coverage = 0.0
    val got = TextOps.vocabRichness(
        Seq(("g1", "a a b"), ("g1", "c"), ("g2", "a")).toDF("g", "text"),
        "g", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("g1") == ((4L, 3L, 2L, 1L, 3.5, 0.5)))
    assert(got("g2") == ((1L, 1L, 1L, 0L, 1.0, 0.0)))
  }

  test("chrF: identical pair scores 1, disjoint pair 0, partial pair " +
    "matches the closed form") {
    import spark.implicits._
    val df = Seq(
      (1, "abcdef", "abcdef"), // identical, len >= maxN
      (2, "aaaaaa", "bbbbbb"), // disjoint at every order
      (3, "abc", "abd")        // P1=R1=2/3, P2=R2=1/2, rest 0
    ).toDF("id", "cand", "ref")
    val got = TextOps.chrF(df, "id", "cand", "ref")
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1) == ((1.0, 1.0, 1.0)))
    assert(got(2)._3 == 0.0)
    val p = (2.0 / 3.0 + 1.0 / 2.0) / 6.0
    assert(math.abs(got(3)._1 - p) < 1e-12, s"chr_p ${got(3)._1}")
    assert(math.abs(got(3)._3 - p) < 1e-12, s"chrf2 ${got(3)._3}") // F(p,p)=p
  }

  test("jensenShannonDivergence: identical distributions -> 0, disjoint " +
    "-> ln 2, and the guard raises on none") {
    import spark.implicits._
    val got = TextOps.jensenShannonDivergence(
        Seq(("a", "x y"), ("b", "x y"), ("c", "u u"), ("d", "v v"))
          .toDF("g", "text"), "g", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    assert(got(("a", "b")) == 0.0)
    assert(math.abs(got(("c", "d")) - math.log(2.0)) < 1e-6,
      s"disjoint jsd ${got(("c", "d"))}")
    // symmetric bound: every pair in [0, ln 2]
    assert(got.values.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9))
  }

  test("rougeL: hand-computed LCS, P/R/F1, empty and clone edges") {
    import spark.implicits._
    val df = Seq(
      (1, "a b c d", "a c d"),      // LCS=3: P=3/4 R=1 F1=2*(3/4)/(7/4)=6/7
      (2, "x", "y"),                // LCS=0 -> all 0
      (3, "a a b", "a b a"),        // LCS=2
      (4, "same text here", "same text here"), // clone -> 1/1/1
      (5, "", "a b")                // empty cand: P=0 R=0 F1=0
    ).toDF("id", "cand", "ref")
    val got = TextOps.rougeL(df, "id", "cand", "ref")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got(1) == ((3L, 0.75, 1.0, 2.0 * 0.75 * 1.0 / 1.75)))
    assert(got(2) == ((0L, 0.0, 0.0, 0.0)))
    assert(got(3)._1 == 2L)
    assert(got(4) == ((3L, 1.0, 1.0, 1.0)))
    assert(got(5) == ((0L, 0.0, 0.0, 0.0)))
    // the kernel participates in whole-stage codegen on a non-local scan
    val plan = spark.range(8).select(
      graft.functions.ArrayMath.lcsLen(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.concat_ws(" ",
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit("a b")), " "),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lit("a b c"), " ")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected WholeStageCodegen\n$plan")
  }

  test("aHash JPEG parity: real ImageIO-encoded payloads hash (non-NULL, " +
    "deterministic, clones equal) and agree with a driver-side replay") {
    import org.apache.spark.sql.functions._
    import graft.ops.Multimodal
    import spark.implicits._
    val df = Seq((1, 16, 12, 10), (2, 16, 12, 10), (3, 16, 12, 200))
      .toDF("id", "w", "h", "r0")
    val got = df.select(col("id"), Multimodal.pngAHash(
        Multimodal.jpegGradientBytes(col("w"), col("h"), col("r0"),
          col("r0"), col("r0"))).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // clones hash equal; a different gradient origin may or may not
    // collide (aHash is coarse) but the values must be deterministic
    assert(got(1) == got(2))
    val again = df.select(col("id"), Multimodal.pngAHash(
        Multimodal.jpegGradientBytes(col("w"), col("h"), col("r0"),
          col("r0"), col("r0"))).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == got)
    // driver-side replay through the SAME kernel entry point — the
    // column path and a direct kernel call must agree bit-for-bit
    val bytes = df.filter(col("id") === 1).select(
        Multimodal.jpegGradientBytes(col("w"), col("h"), col("r0"),
          col("r0"), col("r0"))).head().getAs[Array[Byte]](0)
    assert(graft.functions.AHashKernel.ahash64(bytes).longValue() == got(1))
  }

  test("chrF layout invariance: repartitioned input scores identically") {
    import spark.implicits._
    val df = (1 to 40).map(i =>
      (i, s"doc $i text ${"ab" * (i % 7)}", s"doc ${i / 5 * 5} text"))
      .toDF("id", "cand", "ref")
    val a = TextOps.chrF(df, "id", "cand", "ref")
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    val b = TextOps.chrF(df.repartition(7), "id", "cand", "ref")
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(a == b)
  }
}
