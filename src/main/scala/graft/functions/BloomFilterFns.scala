package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` — membership probe of a 64-bit hash against
  * a Bloom filter whose serialized bits ride in the plan as ONE reference
  * object (like the centroid matrices of [[NearestCentroidId]]), not as a
  * per-row join input.
  *
  * Scale role: a broadcast hash join against a reference set costs ≥ 8
  * bytes per distinct key in every executor plus a shuffle/broadcast of
  * the probe side's survivors; the filter costs ~1.2 BYTES per key at 1%
  * false positives, and the probe runs INSIDE whole-stage codegen before
  * any exchange — so the 100 TB side is pruned to ~(match + fpp) fraction
  * before the first shuffle. False positives mean the op that uses this is
  * a PREFILTER: an exact confirm join must follow (and then the composed
  * result is exact — see `Curation.contaminatedDocsBloom`). No false
  * negatives: a true member always passes (guaranteed by the sketch).
  *
  * The filter deserializes lazily ONCE per executor from the expression's
  * own serialized bytes (`@transient lazy`); generated code calls back
  * into [[filter]] via an `addReferenceObj` handle, keeping the probe a
  * single virtual call inside the codegen span.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType

  @transient lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.filter().mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
