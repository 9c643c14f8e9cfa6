package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization of an embedding vector:
  * `struct(scale, code_sum, max_abs_err, codes)` where
  * scale = max|x_i|, code_i = round(x_i / scale · 127) ∈ [-127, 127]
  * (half-away-from-zero, matching Spark's and DuckDB's ROUND), and
  * max_abs_err = max|x_i - code_i·scale/127|.
  *
  * This replaces the staged higher-order-function spelling in
  * [[graft.ops.Quantize]]'s original form: HOF lambdas are interpreted
  * (CodegenFallback, no subexpression elimination), so whether the
  * per-row cost was O(d) or O(d²) depended on whether Catalyst's
  * CollapseProject re-inlined the staged scale column into the lambdas —
  * a 26× swing observed between identical-code bench runs. As a single
  * codegen'd kernel the pass is O(d) BY CONSTRUCTION: the scale is a
  * local, not a captured expression, and multiple struct-field reads of
  * the same call are deduplicated by whole-stage codegen subexpression
  * elimination (proven by the eval-count test in QuantizeSpec).
  *
  * NULL on out-of-scope input (empty array or null element) — the kernel
  * convention shared with [[PqEncode]].
  */
case class Int8Stats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.catalogString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = Int8Stats.schema

  override def nullSafeEval(v: Any): Any =
    Int8QuantKernel.stats(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Int8QuantKernel.stats($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "int8_stats"
}

object Int8Stats {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
}

/** Static kernel shared by eval and generated code. */
object Int8QuantKernel {

  /** Test-only evaluation counter, scoped by vector DIMENSION rather
    * than a global on/off window (the hot path pays one predictable
    * compare, no atomics, when disarmed at -1): the QuantizeSpec
    * eval-count test arms it with a marker dimension only its own
    * fixture uses and asserts the kernel runs exactly once per row even
    * after CollapseProject merges the staged projections — the
    * structural guarantee the HOF spelling lacked. Dimension scoping
    * keeps the assertion immune to OTHER suites evaluating Int8Stats
    * concurrently in the same JVM (parallel-suite runs would inflate a
    * global window; their vectors never have the marker dimension).
    */
  @volatile var countDim: Int = -1
  val evalCount: AtomicLong = new AtomicLong

  /** null when the array is empty or contains a null element. */
  def stats(v: ArrayData, isFloat: Boolean): InternalRow = {
    if (countDim == v.numElements()) evalCount.incrementAndGet()
    val n = v.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    var scale = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val ax = Math.abs(x)
      if (ax > scale) scale = ax
      i += 1
    }
    val codes = new Array[Byte](n)
    var codeSum = 0L
    var maxErr = 0.0
    if (scale != 0.0) { // all-zero vectors quantize to all-zero codes, err 0
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x / scale * 127.0
        // ROUND_HALF_UP away from zero, the Spark/DuckDB ROUND semantics;
        // Math.round alone is half-toward-+inf, which differs at -k.5
        val r = if (t >= 0) Math.round(t) else -Math.round(-t)
        codes(i) = r.toByte
        codeSum += r
        val err = Math.abs(x - r * scale / 127.0)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, codeSum, maxErr, new GenericArrayData(codes)))
  }
}
