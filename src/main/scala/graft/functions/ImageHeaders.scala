package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parsing over opaque binary columns — the
  * first honest step of multimodal decode, done without any codec library:
  * PNG's IHDR chunk and JPEG's SOFn segment are public fixed-layout binary
  * structures (PNG spec §11.2.2; JPEG/JFIF ITU T.81 §B.2.2), so
  * width/height/channels/bit-depth come straight out of the byte stream.
  *
  * One tight pass per row, no allocation except the 5-field result row;
  * same codegen shape as [[TextStats]] (static kernel invoked from
  * generated code, whole-stage span preserved). Unparseable payloads
  * (wrong magic, truncated, marker stream without a SOF) yield NULL —
  * the filter-friendly contract a 100 TB ingest wants: corrupt media is
  * data, not an exception.
  */
object ImageHeaderKernel {

  private val pngFmt = UTF8String.fromString("png")
  private val jpegFmt = UTF8String.fromString("jpeg")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  /** null when `bytes` is neither a parseable PNG nor a parseable JPEG. */
  def parse(bytes: Array[Byte]): InternalRow =
    if (bytes == null) null
    else if (isPng(bytes)) parsePng(bytes)
    else if (bytes.length >= 2 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
      parseJpeg(bytes)
    else null

  // 8-byte signature, and room for the 25-byte IHDR chunk that must follow
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 29 &&
      u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e && u8(b, 3) == 0x47 &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private def parsePng(b: Array[Byte]): InternalRow = {
    // IHDR MUST be the first chunk: length 13, type "IHDR", then
    // width(4 BE) height(4 BE) bit-depth(1) colour-type(1) ...
    if (be32(b, 8) != 13L ||
      !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0L || h <= 0L || w > Int.MaxValue || h > Int.MaxValue) return null
    val bitDepth = u8(b, 24)
    val channels = u8(b, 25) match { // colour type → sample channels
      case 0 => 1 // greyscale
      case 2 => 3 // truecolour
      case 3 => 1 // indexed (palette index is one channel)
      case 4 => 2 // greyscale + alpha
      case 6 => 4 // truecolour + alpha
      case _ => -1
    }
    if (channels < 0) return null
    row(pngFmt, w.toInt, h.toInt, channels, bitDepth)
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    // walk the marker-segment stream from after SOI until a SOFn frame
    // header: FF <marker> [len16 payload...]; fill bytes (repeated FF)
    // are legal padding before any marker
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return null // lost marker alignment
      var j = i
      while (j + 1 < b.length && u8(b, j + 1) == 0xff) j += 1
      if (j + 1 >= b.length) return null
      val marker = u8(b, j + 1)
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn (C4=DHT, C8=JPG, CC=DAC are not frame headers):
        // [len16][precision8][height16][width16][nComponents8]
        if (j + 9 >= b.length) return null
        val precision = u8(b, j + 4)
        val h = be16(b, j + 5)
        val w = be16(b, j + 7)
        val nComp = u8(b, j + 9)
        // h == 0 means "deferred via DNL" — treat as unparseable
        if (w <= 0 || h <= 0 || nComp < 1 || nComp > 4) return null
        return row(jpegFmt, w, h, nComp, precision)
      } else if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 2 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return null // EOI / start-of-scan before any frame header
      } else {
        if (j + 3 >= b.length) return null
        val len = be16(b, j + 2)
        if (len < 2) return null
        i = j + 2 + len
      }
    }
    null
  }

  private def row(fmt: UTF8String, w: Int, h: Int, ch: Int, depth: Int): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, ch, depth))
}

case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    ImageHeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.ImageHeaderKernel.parse($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}
