package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ANIMATED-container frame walking — the multi-frame sibling of
  * [[PngHeaderKernel]]/[[WavPcmKernel]]: a GIF is a logical screen
  * descriptor followed by a block stream (extensions, image
  * descriptors, trailer), so per-frame geometry and timing come out of
  * one strict walk over the public block grammar (CompuServe GIF89a
  * specification, 1990; the layout every browser ships) WITHOUT LZW
  * pixel decode — frame sampling at corpus scale is a metadata plane,
  * not a raster plane. Reference behavior: `/root/reference` has no
  * media decoding at all (Python orchestration only, `dataflow.py`);
  * this is north-star extension surface.
  *
  * Strictness (NULL on violation, never a guess): magic `GIF87a`/
  * `GIF89a`; every length field honored (global/local color tables,
  * sub-block chains); graphic-control blocks must carry their
  * spec-fixed size 4, at most one per rendering block, and only in
  * 89a streams (extensions are an 89a addition — an 87a file carrying
  * one is corrupt); the stream must end with the `0x3B` trailer as
  * its LAST byte (truncated buffers, unknown block introducers and
  * trailing junk all reject); at least one frame. The walk is O(bytes)
  * with no allocation proportional to anything but the frame count
  * (each frame consumes ≥ 11 bytes of input, so frames ≤ len/11 —
  * no amplification for bomb-shaped inputs).
  */
object GifKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** GIF container magic — the sniffing predicate dispatch shares with
    * this kernel (one definition, so sniffing can't drift from scope).
    */
  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Strict frame walk: struct<width,height,n_frames,
    * frames array<struct<x_off,y_off,w,h,delay_cs>>>, null on any
    * grammar violation. `delay_cs` (centiseconds) comes from the
    * graphic-control extension governing the frame (0 when absent —
    * the spec's "no delay" default); per GIF89a a control block applies
    * to exactly the one rendering block that follows it.
    */
  def frames(b: Array[Byte]): InternalRow = {
    if (!isGif(b) || b.length < 14) return null
    val len = b.length
    val is89a = b(4) == '9' // extensions are an 89a addition (spec §Appendix E)
    val w = le16(b, 6)
    val h = le16(b, 8)
    val packed = u8(b, 10)
    var pos = 13
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pendingDelay = 0
    var gcePending = false
    var sawTrailer = false
    while (!sawTrailer) {
      if (pos >= len) return null // ran out before the trailer
      val intro = u8(b, pos); pos += 1
      intro match {
        case 0x3B =>
          if (pos != len) return null // trailing junk after the trailer
          sawTrailer = true
        case 0x21 => // extension: label, then a sub-block chain (89a only)
          if (!is89a || pos >= len) return null
          val label = u8(b, pos); pos += 1
          if (label == 0xF9) { // graphic control: spec-fixed size 4,
            // at most ONE per rendering block — a second before any
            // image descriptor is a grammar violation, not a retime
            if (gcePending || pos + 6 > len || u8(b, pos) != 4) return null
            pendingDelay = le16(b, pos + 2)
            if (u8(b, pos + 5) != 0) return null // block terminator
            pos += 6
            gcePending = true
          } else {
            var sz = -1
            while (sz != 0) {
              if (pos >= len) return null
              sz = u8(b, pos); pos += 1
              if (pos + sz > len) return null
              pos += sz
            }
          }
        case 0x2C => // image descriptor
          if (pos + 9 > len) return null
          val fx = le16(b, pos); val fy = le16(b, pos + 2)
          val fw = le16(b, pos + 4); val fh = le16(b, pos + 6)
          val fp = u8(b, pos + 8)
          pos += 9
          if ((fp & 0x80) != 0) pos += 3 * (1 << ((fp & 7) + 1))
          if (pos >= len) return null
          pos += 1 // LZW minimum code size
          var sz = -1
          while (sz != 0) { // pixel-data sub-block chain (not decoded)
            if (pos >= len) return null
            sz = u8(b, pos); pos += 1
            if (pos + sz > len) return null
            pos += sz
          }
          out += new GenericInternalRow(
            Array[Any](fx, fy, fw, fh, pendingDelay))
          pendingDelay = 0
          gcePending = false
        case _ => return null // unknown block introducer
      }
    }
    if (out.isEmpty) return null // spec: at least one image
    new GenericInternalRow(Array[Any](
      w, h, out.length, new GenericArrayData(out.toArray[Any])))
  }

  /** Fixture-side multi-frame GIF89a encoder: logical screen (w, h),
    * `nFrames` frames whose geometry/timing derive from (seed, i) by
    * the fixed arithmetic below — an oracle replays every field from
    * the inputs without parsing a byte. Pixel sub-blocks are
    * structurally valid chains the walker must skip correctly (content
    * is irrelevant to the metadata plane and never decoded).
    */
  def encodeAnim(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff,
      s"logical screen out of u16 range: ${w}x$h")
    require(nFrames >= 1 && nFrames <= 4096, s"nFrames out of range: $nFrames")
    require(seed >= 0, s"seed must be non-negative: $seed")
    val o = new java.io.ByteArrayOutputStream(32 + 32 * nFrames)
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    o.write('G'); o.write('I'); o.write('F'); o.write('8'); o.write('9'); o.write('a')
    le16(w); le16(h); o.write(0); o.write(0); o.write(0) // no GCT
    var i = 0
    while (i < nFrames) {
      // graphic control: delay_cs = (seed + 13 i) mod 500
      o.write(0x21); o.write(0xF9); o.write(4); o.write(0)
      le16((seed + 13 * i) % 500); o.write(0); o.write(0)
      // descriptor: x=(seed+3i)%8, y=(seed+5i)%8,
      //             w=(seed+7i)%16+1, h=(seed+11i)%16+1
      o.write(0x2C)
      le16((seed + 3 * i) % 8); le16((seed + 5 * i) % 8)
      le16((seed + 7 * i) % 16 + 1); le16((seed + 11 * i) % 16 + 1)
      o.write(0) // no LCT
      o.write(2) // LZW minimum code size
      val l = (seed + i) % 4 + 1 // one data sub-block, varying length
      o.write(l)
      var j = 0
      while (j < l) { o.write((seed + j) & 0xff); j += 1 }
      o.write(0) // chain terminator
      i += 1
    }
    o.write(0x3B)
    o.toByteArray
  }
}

/** binary → struct<width,height,n_frames,frames> parsed by
  * [[GifKernel.frames]]'s strict walk; NULL on any grammar violation.
  * Corpus-scale: codegen'd static-kernel call.
  */
case class GifMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames", ArrayType(StructType(Seq(
      StructField("x_off", IntegerType, nullable = false),
      StructField("y_off", IntegerType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("h", IntegerType, nullable = false),
      StructField("delay_cs", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    GifKernel.frames(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.GifKernel.frames($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gif_meta"
}

/** (w, h, nFrames, seed) → real multi-frame GIF89a bytes
  * ([[GifKernel.encodeAnim]]); fixture side, so eval-mode
  * CodegenFallback costs nothing measurable.
  */
case class GifAnimBytes(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 && children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 4 int args (w, h, nFrames, seed)")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(w, h, n, seed) = vs.map(_.asInstanceOf[Int])
      GifKernel.encodeAnim(w, h, n, seed)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "gif_anim_bytes"
}
