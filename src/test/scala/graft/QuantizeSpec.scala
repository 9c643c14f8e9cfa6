package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Quantize, Similarity}

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("int8 round-trip error is within half a quantization step") {
    val emb = Tables.embeddings(spark, sf)
    // bound: |x - x̂| <= scale/254 (+ tiny fp slack); checked per vector
    val viol = emb.select(
        Quantize.maxAbsError(col("embedding")).as("err"),
        Quantize.int8Scale(col("embedding")).as("s"))
      .filter(col("err") > col("s") / 254.0 + 1e-12)
      .count()
    assert(viol == 0L, s"$viol vectors exceed the quantization error bound")
  }

  test("degenerate vectors quantize safely") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),          // all-zero: scale 0, codes 0
      (2L, Seq(-1.0f, 1.0f, 0.5f))).toDF("id", "v")
    val got = df.select(col("id"),
        Quantize.int8Codes(col("v")).as("codes"),
        Quantize.int8Scale(col("v")).as("s")).orderBy("id").collect()
    assert(got(0).getSeq[Byte](1) == Seq[Byte](0, 0, 0) && got(0).getDouble(2) == 0.0)
    assert(got(1).getSeq[Byte](1) == Seq[Byte](-127, 127, 64)) // round(0.5*127)=64
  }

  test("int8 kernel evaluates exactly once per row in the q61-shaped plan") {
    import spark.implicits._
    import graft.functions.Int8QuantKernel
    // marker dimension no other fixture in the JVM uses: dimension-scoped
    // counting keeps this assertion exact even when other suites evaluate
    // Int8Stats concurrently (parallel-suite runs share the static kernel)
    val markerDim = 193
    val n = 400
    val emb = (0 until n).map { i =>
      (i.toLong, Array.tabulate(markerDim)(j => ((i * 193 + j) % 101 - 50) / 7.0f).toSeq)
    }.toDF("vec_id", "embedding")
    // the exact q61 spelling: one struct projection, three field reads —
    // after CollapseProject the field reads each carry a copy of the
    // Int8Stats call, and whole-stage codegen subexpression elimination
    // must fold them back to ONE kernel invocation per row (the structural
    // guarantee the interpreted-HOF spelling lacked)
    val q61shaped = emb
      .withColumn("__q8", Quantize.int8Stats(col("embedding")))
      .select(col("vec_id"),
        col("__q8.code_sum").as("code_sum"),
        round(col("__q8.scale"), 6).as("scale"),
        round(col("__q8.max_abs_err"), 8).as("max_abs_err"))
    Int8QuantKernel.evalCount.set(0L)
    Int8QuantKernel.countDim = markerDim
    try q61shaped.collect() finally Int8QuantKernel.countDim = -1
    val evals = Int8QuantKernel.evalCount.get()
    assert(evals == n, s"kernel ran $evals times for $n rows — not once per row")
  }

  test("struct fields are consistent: code_sum checksums codes, err bound holds") {
    val got = Tables.embeddings(spark, sf)
      .select(Quantize.int8Stats(col("embedding")).as("q"))
      .select(col("q.code_sum").as("cs"),
        aggregate(col("q.codes"), lit(0L), (a, x) => a + x.cast("long")).as("hof_sum"),
        col("q.max_abs_err").as("err"), col("q.scale").as("s"))
    assert(got.filter(col("cs") =!= col("hof_sum")).count() == 0L)
    assert(got.filter(col("err") > col("s") / 254.0 + 1e-12).count() == 0L)
  }

  test("NULL on out-of-scope input: empty array, null element, null vector") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f)))),
      (2L, Some(Seq.empty[Option[Float]])),        // empty -> NULL
      (3L, Some(Seq(Some(1.0f), None))),           // null element -> NULL
      (4L, Option.empty[Seq[Option[Float]]])       // null vector -> NULL
    ).toDF("id", "v")
    val got = df.select(col("id"), Quantize.int8Stats(col("v")).as("q"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1))
    assert(got(1).isNullAt(1) && got(2).isNullAt(1) && got(3).isNullAt(1))
  }

  test("SQL surface: graft_int8_stats reachable from plain SQL") {
    import spark.implicits._
    Seq((1L, Seq(-1.0, 1.0, 0.5))).toDF("id", "v").createOrReplaceTempView("q8v")
    val r = spark.sql(
      "SELECT q.scale, q.code_sum, q.codes FROM (SELECT graft_int8_stats(v) q FROM q8v)")
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 64L) // -127 + 127 + 64
    assert(r.getSeq[Byte](2) == Seq[Byte](-127, 127, 64))
  }

  test("cosine similarity survives quantization (search-quality contract)") {
    val emb = Tables.embeddings(spark, sf)
    val dq = emb.select(col("vec_id"),
      Quantize.dequantize(
        Quantize.int8Codes(col("embedding")),
        Quantize.int8Scale(col("embedding"))).as("embedding"))
    // per-vector: cosine(original, dequantized) ~ 1
    val worst = emb.join(dq.withColumnRenamed("embedding", "e2"), "vec_id")
      .select(Similarity.cosine(col("embedding"), col("e2")).as("c"))
      .agg(min(col("c"))).head().getDouble(0)
    assert(worst >= 0.9995, s"quantization distorted cosine: worst=$worst")
    // and brute-force top-10 on dequantized vectors ≈ top-10 on originals
    val q = emb.filter(col("vec_id") === 1L)
      .select(Similarity.asDouble(col("embedding")).as("query_vec"))
    def top(d: org.apache.spark.sql.DataFrame) =
      Similarity.bruteTopK(d, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
    val overlap = (top(emb) & top(dq)).size
    assert(overlap >= 8, s"top-10 overlap after quantization only $overlap/10")
  }
}
