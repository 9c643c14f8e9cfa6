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
