package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL PNG pixel decode over opaque binary columns — the step past
  * [[ImageHeaderKernel]]'s container parsing: IDAT is zlib (RFC 1950/1951,
  * `java.util.zip.Inflater` — no codec library needed), scanlines carry
  * the five PNG filter types (spec §9: None/Sub/Up/Average/Paeth) which
  * are inverted here byte-for-byte, and the decoded samples reduce to
  * per-channel means — the canonical cheap image feature (brightness /
  * color statistics) a multimodal curation pipeline gates on.
  *
  * Scope (documented, NULL outside it — corrupt or unsupported media is
  * data, not an exception): 8-bit depth, colour types 0 (grey),
  * 2 (RGB), 6 (RGBA), non-interlaced, raw size ≤ 64 MiB (the
  * decompression-bomb guard: a 100 TB ingest must bound per-row work).
  * IHDR and IDAT CRCs are VERIFIED — a flipped bit yields NULL, not
  * garbage statistics. Alpha is reported as a channel but excluded from
  * the means (fully transparent pixels still carry colour samples).
  */
object PngPixelKernel {

  private[functions] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private[functions] def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  /** PNG signature — shared with [[graft.ops.Multimodal.extractFeatures]]
    * sniffing (one definition, so sniffing can't drift from decoder scope).
    */
  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 29 &&
      u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e && u8(b, 3) == 0x47 &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private[functions] def crcOk(b: Array[Byte], typeOff: Int, len: Int): Boolean = {
    val crc = new CRC32()
    crc.update(b, typeOff, 4 + len)
    crc.getValue == be32(b, typeOff + 4 + len)
  }

  /** Max raw (decompressed) image bytes: 64 MiB. */
  val MaxRawBytes: Long = 1L << 26

  /** A decoded in-scope PNG: packed interleaved 8-bit samples (length =
    * width · height · channels, filter bytes stripped) — the buffer shape
    * every downstream pixel op (resize, channel stats) consumes.
    */
  final class DecodedImage(val width: Int, val height: Int,
                           val channels: Int, val samples: Array[Byte])

  /** Full decode to packed samples: container walk + CRC verify + zlib
    * inflate + per-scanline defilter. null outside the documented scope.
    */
  def decodeImage(b: Array[Byte]): DecodedImage = {
    if (b == null || !isPng(b)) return null
    // IHDR must be first (spec §5.6); its CRC sits at bytes [29, 33)
    if (b.length < 33 || be32(b, 8) != 13L ||
      !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    if (!crcOk(b, 12, 13)) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0L || h <= 0L || w > Int.MaxValue || h > Int.MaxValue) return null
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val compression = u8(b, 26)
    val filterMethod = u8(b, 27)
    val interlace = u8(b, 28)
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return null // palette / grey+alpha out of scope
    }
    if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
      interlace != 0) return null
    val bpp = channels
    val stride = w * bpp // samples per scanline, excluding the filter byte
    val rawLen = (stride + 1L) * h
    if (rawLen > MaxRawBytes) return null

    // walk chunks, concatenating IDAT payloads until IEND
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8 + 25 // first chunk after IHDR
    var ended = false
    while (!ended) {
      if (i + 8 > b.length) return null // ran out before IEND
      val len = be32(b, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > b.length) return null
      val l = len.toInt
      val isIdat = b(i + 4) == 'I' && b(i + 5) == 'D' && b(i + 6) == 'A' && b(i + 7) == 'T'
      val isIend = b(i + 4) == 'I' && b(i + 5) == 'E' && b(i + 6) == 'N' && b(i + 7) == 'D'
      if (isIdat) {
        if (!crcOk(b, i + 4, l)) return null
        idat.write(b, i + 8, l)
      } else if (isIend) ended = true
      // ancillary chunks (tEXt, pHYs, ...) are walked past unverified
      i += 12 + l
    }
    if (idat.size() == 0) return null

    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // n == 0 with room left in the output buffer means the stream
        // cannot progress: truncated input, or an FDICT (preset
        // dictionary) zlib header — needsDictionary() — which inflate()
        // reports by returning 0 with needsInput() still false. Either
        // way: corrupt media is data, return NULL (a bare needsInput()
        // check here would spin forever on FDICT streams).
        if (n == 0 && !inf.finished()) return null
        off += n
      }
      if (off != raw.length) return null // short stream
      // an over-long stream must be NULL, not silently truncated to the
      // declared raster (per-chunk CRCs can all be valid on such a
      // stream). Probe one byte: a conforming stream finishes exactly at
      // the raster size — the probe also consumes the zlib trailer, so
      // Adler-32 gets verified (DataFormatException on mismatch) instead
      // of being skipped.
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        if (inf.inflate(probe, 0, 1) > 0 || !inf.finished()) return null
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // defilter in place, scanline by scanline (spec §9); `prior` indexes
    // the already-reconstructed previous scanline
    val wS = stride.toInt
    var y = 0
    while (y < h) {
      val rowOff = y * (wS + 1)
      val ft = u8(raw, rowOff)
      val cur = rowOff + 1
      val prior = cur - (wS + 1)
      if (ft < 0 || ft > 4) return null
      var x = 0
      while (x < wS) {
        val a = if (x >= bpp) u8(raw, cur + x - bpp) else 0 // left
        val bb = if (y > 0) u8(raw, prior + x) else 0 // up
        val c = if (x >= bpp && y > 0) u8(raw, prior + x - bpp) else 0 // up-left
        val recon = ft match {
          case 0 => u8(raw, cur + x)
          case 1 => u8(raw, cur + x) + a
          case 2 => u8(raw, cur + x) + bb
          case 3 => u8(raw, cur + x) + ((a + bb) >> 1)
          case 4 =>
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
            u8(raw, cur + x) + pred
        }
        raw(cur + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }

    // repack: strip the per-scanline filter bytes into a contiguous
    // width·height·channels sample buffer
    val packed = new Array[Byte]((w * h).toInt * bpp)
    y = 0
    while (y < h) {
      System.arraycopy(raw, y * (wS + 1) + 1, packed, y * wS, wS)
      y += 1
    }
    new DecodedImage(w.toInt, h.toInt, channels, packed)
  }

  /** null for anything outside the documented scope; otherwise
    * (width, height, channels, mean_r, mean_g, mean_b).
    */
  def decode(b: Array[Byte]): InternalRow = {
    val img = decodeImage(b)
    if (img == null) return null
    val sums = channelSumsOf(img.samples, img.channels)
    val n = (img.width.toLong * img.height).toDouble
    new GenericInternalRow(Array[Any](img.width, img.height, img.channels,
      sums(0) / n, sums(1) / n, sums(2) / n))
  }

  /** (sum_r, sum_g, sum_b) over a packed interleaved buffer; grey maps to
    * all three, alpha (channels = 4) excluded — same convention as the
    * means in [[decode]].
    */
  private[functions] def channelSumsOf(px: Array[Byte], channels: Int): Array[Long] = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      if (channels == 1) { val v = px(i) & 0xff; sr += v; sg += v; sb += v }
      else {
        sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
      }
      i += channels
    }
    Array(sr, sg, sb)
  }

  /** Max output edge for [[resize]]: 4096 px (bounds per-row work the
    * same way [[MaxRawBytes]] bounds decode).
    */
  val MaxResizeEdge: Int = 4096

  /** Decode + nearest-neighbor resample to (outW, outH): output pixel
    * (x, y) copies source pixel (⌊x·w/outW⌋, ⌊y·h/outH⌋) — the standard
    * floor mapping, integer-exact so an oracle can replay it. Channel
    * count is preserved. null when the payload is out of decode scope or
    * the target dims leave [1, [[MaxResizeEdge]]].
    */
  def resize(b: Array[Byte], outW: Int, outH: Int): InternalRow = {
    if (outW < 1 || outW > MaxResizeEdge || outH < 1 || outH > MaxResizeEdge)
      return null
    val img = decodeImage(b)
    if (img == null) return null
    val c = img.channels
    val out = new Array[Byte](outW * outH * c)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      val srcRow = sy * img.width * c
      val dstRow = y * outW * c
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        var ch = 0
        while (ch < c) {
          out(dstRow + x * c + ch) = img.samples(srcRow + sx * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](outW, outH, c, out))
  }

  /** Per-channel integer sums over a packed interleaved 8-bit buffer (the
    * `pixels` field of [[resize]]'s result): (n_px, sum_r, sum_g, sum_b).
    * null when the buffer length is not a multiple of the channel count
    * or the channel count is not 1/3/4.
    */
  def channelStats(px: Array[Byte], channels: Int): InternalRow = {
    if (px == null || (channels != 1 && channels != 3 && channels != 4) ||
      px.length % channels != 0) return null
    val sums = channelSumsOf(px, channels)
    new GenericInternalRow(Array[Any](
      (px.length / channels).toLong, sums(0), sums(1), sums(2)))
  }
}

/** binary → struct<width,height,channels,mean_r,mean_g,mean_b> from a
  * genuinely decoded PNG (inflate + defilter + channel statistics); NULL
  * outside [[PngPixelKernel]]'s documented scope. Same static-kernel
  * codegen shape as [[ImageMeta]].
  */
case class PngPixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    PngPixelKernel.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.PngPixelKernel.decode($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "png_pixel_stats"
}

/** (png binary, out_w, out_h) → struct<width,height,channels,pixels>:
  * genuine decode then nearest-neighbor resample ([[PngPixelKernel.resize]]
  * — ⌊x·w/outW⌋ source mapping, integer-exact). The packed `pixels`
  * buffer feeds downstream feature ops ([[RgbChannelStats]]) without
  * re-decoding. NULL outside decode scope or for target dims off
  * [1, 4096]. Corpus-scale: codegen'd static-kernel call.
  */
case class PngResizePixels(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  override protected def nullSafeEval(b: Any, w: Any, h: Any): Any =
    PngPixelKernel.resize(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) => s"""
       |${ev.value} = graft.functions.PngPixelKernel.resize($b, $w, $h);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "png_resize"
}

/** (pixels binary, channels) → struct<n_px,sum_r,sum_g,sum_b>: exact
  * per-channel integer sums over a packed interleaved 8-bit buffer — the
  * cheap colour-statistics feature extracted from [[PngResizePixels]]
  * output (or any raw RGB/grey/RGBA frame buffer) without re-decoding.
  * Integer-exact, so oracles replay it bit-for-bit. NULL for channel
  * counts outside {1, 3, 4} or buffers that don't tile by the channel
  * count.
  */
case class RgbChannelStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int), got " +
          s"${a.catalogString} and ${b.catalogString}")
    }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  override protected def nullSafeEval(px: Any, c: Any): Any =
    PngPixelKernel.channelStats(px.asInstanceOf[Array[Byte]], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, c) => s"""
       |${ev.value} = graft.functions.PngPixelKernel.channelStats($px, $c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rgb_channel_stats"
}

/** Fixture-side REAL PNG encoder: 8-bit RGB, pixel (x, y) =
  * ((r0+x+y)%256, (g0+x+y)%256, (b0+x+y)%256) — a gradient whose channel
  * means are closed-form in (w, h, r0, g0, b0), so a SQL oracle can
  * verify a genuine zlib decode end-to-end. Scanline filters CYCLE
  * through all five PNG types (y mod 5), so decoding these bytes proves
  * the full defilter path, not just filter 0. Real Deflater stream, real
  * CRC32s — [[PngPixelStats]] treats these bytes exactly like encoder
  * output from the wild.
  */
object PngEncodeKernel {

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    payload: Array[Byte]): Unit = {
    val len = payload.length
    out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(payload, 0, len)
    val crc = new CRC32()
    crc.update(t, 0, 4)
    crc.update(payload, 0, len)
    val v = crc.getValue
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  def encode(w: Int, h: Int, r0: Int, g0: Int, b0: Int): Array[Byte] = {
    require(w >= 1 && w <= 4096 && h >= 1 && h <= 4096,
      s"png fixture dims out of [1, 4096]: ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    // raw pixels
    val px = Array.ofDim[Int](h, stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y)(x * 3) = (r0 + x + y) & 0xff // %256 == &0xff for non-negatives
        px(y)(x * 3 + 1) = (g0 + x + y) & 0xff
        px(y)(x * 3 + 2) = (b0 + x + y) & 0xff
        x += 1
      }
      y += 1
    }
    // filtered scanline stream: filter type y % 5
    val filtered = new Array[Byte](h * (stride + 1))
    y = 0
    while (y < h) {
      val ft = y % 5
      val off = y * (stride + 1)
      filtered(off) = ft.toByte
      var x = 0
      while (x < stride) {
        val raw = px(y)(x)
        val a = if (x >= bpp) px(y)(x - bpp) else 0
        val b = if (y > 0) px(y - 1)(x) else 0
        val c = if (x >= bpp && y > 0) px(y - 1)(x - bpp) else 0
        val out = ft match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw - pred
        }
        filtered(off + 1 + x) = (out & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream
    val def_ = new Deflater()
    val compressed = new java.io.ByteArrayOutputStream()
    try {
      def_.setInput(filtered)
      def_.finish()
      val buf = new Array[Byte](8192)
      while (!def_.finished()) {
        val n = def_.deflate(buf)
        compressed.write(buf, 0, n)
      }
    } finally def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // colour type: truecolour
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // compression, filter, interlace
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", compressed.toByteArray)
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }
}

/** (w, h, r0, g0, b0) → real PNG bytes ([[PngEncodeKernel]]); fixture
  * side, so eval-mode CodegenFallback costs nothing measurable (same
  * reasoning as [[BpeMergePair]]).
  */
case class PngGradientBytes(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 5 && children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 5 int args (w, h, r0, g0, b0)")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(w, h, r0, g0, b0) = vs.map(_.asInstanceOf[Int])
      PngEncodeKernel.encode(w, h, r0, g0, b0)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "png_gradient_bytes"
}
