package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real audio-container header parsing — the audio sibling of
  * [[ImageHeaderKernel]]: WAV/RIFF is a public fixed-layout chunked binary
  * format (the canonical PCM container), so channels / sample rate / bit
  * depth / frame count come straight out of the byte stream with a chunk
  * walk (RIFF header, then `fmt ` and `data` chunks in any order, odd
  * sizes padded to even). Same contracts as the image kernel: one tight
  * pass, unparseable payloads (bad magic, truncated chunks, non-PCM
  * format codes, zero-size frames) yield NULL — corrupt media is data,
  * not an exception.
  */
object WavHeaderKernel {

  private val wavFmt = UTF8String.fromString("wav")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, a: Char, c: Char, d: Char, e: Char) =
    b(i) == a && b(i + 1) == c && b(i + 2) == d && b(i + 3) == e

  /** null unless `bytes` is a complete parseable PCM/float WAV. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, 'R', 'I', 'F', 'F') || !tag(b, 8, 'W', 'A', 'V', 'E')) return null
    var i = 12
    var fmtSeen = false
    var channels = 0
    var rate = 0L
    var bits = 0
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return null // truncated chunk
      if (tag(b, i, 'f', 'm', 't', ' ')) {
        if (size < 16) return null
        val p = i + 8
        val code = le16(b, p)
        if (code != 1 && code != 3) return null // PCM / IEEE-float only
        channels = le16(b, p + 2)
        rate = le32(b, p + 4)
        bits = le16(b, p + 14)
        fmtSeen = true
      } else if (tag(b, i, 'd', 'a', 't', 'a')) {
        dataSize = size
      } // other chunks (LIST, fact, ...) are walked past
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    if (!fmtSeen || dataSize < 0) return null
    // rate is an unsigned 32-bit field narrowed into an Int struct column:
    // reject values above Int.MaxValue instead of reporting them wrapped
    if (channels < 1 || rate <= 0 || rate > Int.MaxValue ||
        bits < 8 || bits % 8 != 0) return null
    val block = channels * (bits / 8)
    new GenericInternalRow(Array[Any](
      wavFmt, channels, rate.toInt, bits, dataSize / block))
  }
}

/** binary → struct<format,channels,sample_rate,bits_per_sample,n_frames>
  * parsed from a real WAV container; NULL for unparseable payloads. Same
  * static-kernel codegen shape as [[ImageMeta]].
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    WavHeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WavHeaderKernel.parse($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}
