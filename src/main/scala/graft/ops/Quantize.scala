package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard 4× storage/IO reduction (float32 → int8 + one float scale) for
  * corpus-scale vector stores; at 100 TB of embeddings this is the
  * difference between scanning 100 TB and scanning 25 TB for the same
  * candidate generation.
  *
  * Scheme: scale = max|x_i| (per vector), code_i = round(x_i / scale · 127)
  * ∈ [-127, 127], dequantized x̂_i = code_i · scale / 127. Max absolute
  * reconstruction error is scale/254 (half a quantization step).
  *
  * Everything is Spark built-ins (codegen'd, no UDF) over exact double
  * arithmetic, and every aggregate used by the q61 oracle is
  * ORDER-INDEPENDENT (integer sums, max) — so the DuckDB hash-compare is
  * immune to accumulation-order float drift.
  */
object Quantize {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Per-vector symmetric scale = max|x_i| (0.0 for all-zero vectors). */
  def int8Scale(vec: Column): Column = array_max(transform(asDouble(vec), abs(_)))

  /** int8 codes from a PRECOMPUTED scale column. Use this form in real
    * plans: `scale` should be a projected column (one array_max per row),
    * not an inline expression — higher-order-function lambdas evaluate
    * their captured expressions PER ELEMENT, so inlining the scale would
    * turn a d-element pass into d² (measured 7.5 s → sub-second on the
    * q61 bench fixture).
    */
  def int8CodesFromScale(vec: Column, scale: Column): Column =
    transform(asDouble(vec), x =>
      when(scale === 0.0, lit(0).cast("tinyint"))
        .otherwise(round(x / scale * 127.0).cast("tinyint")))

  /** int8 codes; all-zero vectors quantize to all-zero codes.
    * Convenience form — see [[int8CodesFromScale]] for the hot path.
    */
  def int8Codes(vec: Column): Column = int8CodesFromScale(vec, int8Scale(vec))

  /** Reconstruct doubles from codes + scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale / 127.0)

  /** Per-vector max |x - x̂| from precomputed codes + scale columns —
    * max is order-free, so this is oracle-safe.
    */
  def maxAbsErrorFromParts(vec: Column, codes: Column, scale: Column): Column =
    array_max(zip_with(asDouble(vec), dequantize(codes, scale),
      (a, b) => abs(a - b)))

  /** Convenience form of [[maxAbsErrorFromParts]] (recomputes codes/scale —
    * fine for tests, not for wide scans).
    */
  def maxAbsError(vec: Column): Column =
    maxAbsErrorFromParts(vec, int8Codes(vec), int8Scale(vec))
}
