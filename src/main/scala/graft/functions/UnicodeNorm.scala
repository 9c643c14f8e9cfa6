package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen kernel.
  *
  * Why it exists: content dedup keys on byte-identical normalized text, but
  * unicode lets the SAME canonical text arrive under different byte
  * sequences (composed U+00E9 vs decomposed e + U+0301) — fingerprints
  * diverge, exact dedup misses true duplicates, and band buckets split.
  * Production curation pipelines NFC-fold before fingerprinting; Spark has
  * no built-in, and a Scala UDF would break whole-stage codegen in the
  * hottest projection of the dedup plane. DuckDB's `nfc_normalize` is the
  * cross-engine oracle twin (Unicode TR-15 is a public spec; both engines
  * implement the same canonical composition).
  *
  * Fast path: a pure-ASCII string (numBytes == numChars in UTF-8) is NFC
  * by construction — returned as-is, no String round-trip, so the common
  * English-web case costs one byte/char count compare.
  */
object UnicodeNormKernel {

  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // all-ASCII ⇒ already NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** string → NFC-normalized string (null-intolerant: null in, null out). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
