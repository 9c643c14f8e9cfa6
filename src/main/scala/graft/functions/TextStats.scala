package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document text statistics: token count, stopword count,
  * total token chars, punctuation chars, and per-language marker counts.
  *
  * The declarative spelling needs 6+ interpreted higher-order passes per
  * row (filter×5, aggregate, regexp_replace); this computes all eight
  * numbers in a single tokenization pass. Token semantics mirror
  * `split(trim(text), "\\s+")` and DuckDB's `string_split_regex`, so
  * quality/lang-ID oracles are unaffected (integer counts are identical,
  * hence derived ratios are bit-identical).
  */
object TextStatsKernel {

  // keep in sync with TextOps.defaultStopwords / TextOps.langMarkers
  val stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this")
  val markersEn: Set[String] = Set("the", "and", "of", "to", "is", "in", "that", "it")
  val markersDe: Set[String] = Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
  val markersEs: Set[String] = Set("el", "la", "los", "de", "que", "y", "es", "un")
  val markersFr: Set[String] = Set("le", "la", "les", "et", "est", "un", "une", "que")

  private def isPunct(c: Char): Boolean = c >= '!' && c <= '~' &&
    !(c >= '0' && c <= '9') && !(c >= 'A' && c <= 'Z') && !(c >= 'a' && c <= 'z')

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var nPunct = 0L
    var i = 0
    while (i < s.length) { if (isPunct(s.charAt(i))) nPunct += 1; i += 1 }

    var nTok = 0L; var nStop = 0L; var tokChars = 0L
    var en = 0L; var de = 0L; var es = 0L; var fr = 0L
    var start = -1
    var j = 0
    val n = s.length
    // manual whitespace scan == split(trim(s), "\\s+") token stream
    def flush(end: Int): Unit = if (start >= 0) {
      nTok += 1
      tokChars += (end - start)
      val lower = s.substring(start, end).toLowerCase
      if (stopwords.contains(lower)) nStop += 1
      if (markersEn.contains(lower)) en += 1
      if (markersDe.contains(lower)) de += 1
      if (markersEs.contains(lower)) es += 1
      if (markersFr.contains(lower)) fr += 1
      start = -1
    }
    while (j < n) {
      if (Character.isWhitespace(s.charAt(j))) flush(j)
      else if (start < 0) start = j
      j += 1
    }
    flush(n)
    new GenericInternalRow(Array[Any](nTok, nStop, tokChars, nPunct, en, de, es, fr))
  }
}

case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("tok_chars", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("s_en", LongType, nullable = false),
    StructField("s_de", LongType, nullable = false),
    StructField("s_es", LongType, nullable = false),
    StructField("s_fr", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}
