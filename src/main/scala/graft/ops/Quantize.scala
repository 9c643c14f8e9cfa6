package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

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
  * The whole scheme is ONE native codegen'd kernel
  * ([[graft.functions.Int8Stats]]): a single O(d) pass produces
  * `struct(scale, code_sum, max_abs_err, codes)`. The previous spelling
  * staged Spark higher-order functions behind projected columns; HOFs are
  * interpreted (no subexpression elimination), so a CollapseProject that
  * re-inlined the scale into a lambda silently turned the pass O(d²) — a
  * 26× bench swing on identical code. The native kernel is immune by
  * construction, and every aggregate the q61 oracle reads (integer
  * code_sum, max) stays ORDER-INDEPENDENT, so the DuckDB hash-compare is
  * immune to accumulation-order float drift.
  */
object Quantize {

  /** One-pass quantization struct `(scale, code_sum, max_abs_err, codes)` —
    * the form real plans should use; project it once and read its fields
    * (whole-stage codegen deduplicates repeated field reads of the same
    * call). Accepts array<float> or array<double>; NULL on empty/
    * null-element input. Caller must have registered graft functions on
    * the session (all graft entry points do).
    */
  def int8Stats(vec: Column): Column = call_function(ArrayMath.int8StatsName, vec)

  /** Per-vector symmetric scale = max|x_i| (0.0 for all-zero vectors). */
  def int8Scale(vec: Column): Column = int8Stats(vec).getField("scale")

  /** int8 codes; all-zero vectors quantize to all-zero codes. */
  def int8Codes(vec: Column): Column = int8Stats(vec).getField("codes")

  /** Per-vector max |x - x̂| reconstruction error. */
  def maxAbsError(vec: Column): Column = int8Stats(vec).getField("max_abs_err")

  /** Σ codes as long — an order-independent integer checksum of the exact
    * codes (what the q61 oracle pins).
    */
  def codeSum(vec: Column): Column = int8Stats(vec).getField("code_sum")

  /** Reconstruct doubles from codes + scale. Built-in HOF spelling — this
    * is a reference/test surface (the search hot path scores codes
    * directly via the native Int8DotProduct kernel, never dequantizes).
    */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale / 127.0)
}
