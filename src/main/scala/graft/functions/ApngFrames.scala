package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** APNG frame-control walking — the PNG-family sibling of [[GifKernel]]:
  * an APNG is a PNG whose chunk stream carries one `acTL` (animation
  * control) before `IDAT` plus per-frame `fcTL` (frame control) and
  * `fdAT` (frame data) chunks, so the full frame catalog — geometry,
  * timing, dispose/blend semantics — comes out of the SAME chunk walk
  * [[PngPixelKernel]] certifies, CRC-verified per chunk, without
  * inflating a single frame payload (W3C PNG 3rd edition §APNG /
  * Mozilla APNG spec; public layout). Reference behavior:
  * `/root/reference` has no media decoding (Python orchestration only);
  * north-star extension surface.
  *
  * Strictness (NULL on violation, never a guess): PNG signature; IHDR
  * first; exactly ONE `acTL`, before `IDAT`; every chunk's CRC valid;
  * `num_frames` equals the `fcTL` count (≥ 1); sequence numbers over
  * fcTL/fdAT consecutive from 0 in stream order; when the first `fcTL`
  * precedes `IDAT` its rect must be the full canvas at (0,0) with
  * `blend_op` SOURCE (the spec's first-frame rules); every later frame
  * rect inside the canvas with positive dims; `IEND` the LAST chunk
  * with nothing after it. The walk is O(bytes); per-frame state is 8
  * ints, frames ≤ len/38 (fcTL is a 26-byte chunk + 12 overhead) — no
  * amplification for bomb-shaped inputs.
  */
object ApngKernel {

  import PngPixelKernel.{u8, be32, crcOk, isPng}

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** APNG sniffing predicate: a structurally walkable animated PNG —
    * exactly [[frames]]' scope (one definition via delegation, so
    * dispatch can't drift from walker scope).
    */
  def isApng(b: Array[Byte]): Boolean = frames(b) != null

  /** Strict frame-control walk: struct<width,height,n_frames,n_plays,
    * frames array<struct<w,h,x_off,y_off,delay_num,delay_den,dispose,
    * blend>>>, null on any violation of the grammar above. `delay_den`
    * is reported raw (the spec maps 0 to 1/100 s at render time —
    * semantics belong to the caller, the container plane reports the
    * stored field).
    */
  def frames(b: Array[Byte]): InternalRow = {
    if (!isPng(b)) return null
    val len = b.length
    var pos = 8
    var w = 0; var h = 0
    var first = true
    var sawActl = false; var sawIdat = false; var sawIend = false
    var nFrames = -1; var nPlays = 0
    var nextSeq = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (!sawIend) {
      if (pos + 12 > len) return null // truncated before IEND
      val dlen = be32(b, pos)
      if (dlen > Int.MaxValue - 12 || pos + 12 + dlen > len) return null
      val t = pos + 4
      val d = pos + 8
      if (!crcOk(b, t, dlen.toInt)) return null
      if (first) {
        if (!tag(b, t, "IHDR") || dlen != 13) return null
        w = be32(b, d).toInt; h = be32(b, d + 4).toInt
        if (w <= 0 || h <= 0) return null
        first = false
      } else if (tag(b, t, "acTL")) {
        // exactly one, strictly before any IDAT (spec §acTL)
        if (sawActl || sawIdat || dlen != 8) return null
        nFrames = be32(b, d).toInt; nPlays = be32(b, d + 4).toInt
        if (nFrames < 1) return null
        sawActl = true
      } else if (tag(b, t, "fcTL")) {
        if (dlen != 26) return null
        if (be32(b, d) != nextSeq) return null // consecutive from 0
        nextSeq += 1
        val fw = be32(b, d + 4).toInt; val fh = be32(b, d + 8).toInt
        val fx = be32(b, d + 12).toInt; val fy = be32(b, d + 16).toInt
        val dnum = be16(b, d + 20); val dden = be16(b, d + 22)
        val dispose = u8(b, d + 24); val blend = u8(b, d + 25)
        if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
          fx.toLong + fw > w || fy.toLong + fh > h) return null
        if (dispose > 2 || blend > 1) return null
        // first-frame rules when its control precedes IDAT (spec §fcTL):
        // full canvas at the origin, blend SOURCE
        if (out.isEmpty && !sawIdat &&
          (fw != w || fh != h || fx != 0 || fy != 0 || blend != 0)) return null
        out += new GenericInternalRow(
          Array[Any](fw, fh, fx, fy, dnum, dden, dispose, blend))
      } else if (tag(b, t, "fdAT")) {
        if (dlen < 4 || out.isEmpty) return null
        if (be32(b, d) != nextSeq) return null
        nextSeq += 1
      } else if (tag(b, t, "IDAT")) {
        sawIdat = true
      } else if (tag(b, t, "IEND")) {
        if (dlen != 0) return null
        if (pos + 12 != len) return null // IEND must be the last bytes
        sawIend = true
      }
      // other ancillary chunks (tEXt, pHYs, …) pass with CRC checked
      pos += 12 + dlen.toInt
    }
    if (!sawActl || !sawIdat || out.length != nFrames) return null
    new GenericInternalRow(Array[Any](
      w, h, nFrames, nPlays, new GenericArrayData(out.toArray[Any])))
  }

  /** Fixture-side APNG encoder: `nFrames` frame controls whose
    * geometry/timing derive from (seed, i) by the fixed arithmetic
    * below (frame 0 is the spec-mandated full canvas at the origin with
    * blend SOURCE; later frames use the planted offsets/dims). IDAT and
    * fdAT payloads are CRC-valid deterministic bytes — the frame
    * CATALOG plane never inflates them (the pixel plane has its own
    * real encoder, [[PngEncodeKernel]]).
    */
  def encodeAnim(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
    require(w >= 24 && h >= 24 && w <= 0xffff && h <= 0xffff,
      s"canvas out of fixture range: ${w}x$h")
    require(nFrames >= 1 && nFrames <= 4096, s"nFrames out of range: $nFrames")
    require(seed >= 0, s"seed must be non-negative: $seed")
    val o = new java.io.ByteArrayOutputStream(64 + 64 * nFrames)
    def be32w(v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def chunk(t: String, data: Array[Byte]): Unit = {
      be32w(data.length.toLong)
      val tb = t.getBytes("US-ASCII")
      o.write(tb)
      o.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      be32w(crc.getValue)
    }
    def be32a(vs: Long*): Array[Byte] = {
      val a = new Array[Byte](vs.length * 4)
      vs.zipWithIndex.foreach { case (v, i) =>
        a(i * 4) = ((v >> 24) & 0xff).toByte; a(i * 4 + 1) = ((v >> 16) & 0xff).toByte
        a(i * 4 + 2) = ((v >> 8) & 0xff).toByte; a(i * 4 + 3) = (v & 0xff).toByte
      }
      a
    }
    o.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32a(w.toLong, h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)) // 8-bit RGB
    chunk("acTL", be32a(nFrames.toLong, (seed % 4).toLong))
    def fctl(seq: Long, i: Int): Array[Byte] = {
      val (fw, fh, fx, fy) =
        if (i == 0) (w, h, 0, 0)
        else ((seed + 7 * i) % 16 + 1, (seed + 11 * i) % 16 + 1,
          (seed + 3 * i) % 8, (seed + 5 * i) % 8)
      val dnum = (seed + 13 * i) % 500
      val dden = (seed + 5 * i) % 1000
      val dispose = (seed + i) % 3
      val blend = if (i == 0) 0 else i % 2
      be32a(seq, fw.toLong, fh.toLong, fx.toLong, fy.toLong) ++
        Array[Byte](((dnum >> 8) & 0xff).toByte, (dnum & 0xff).toByte,
          ((dden >> 8) & 0xff).toByte, (dden & 0xff).toByte,
          dispose.toByte, blend.toByte)
    }
    chunk("fcTL", fctl(0L, 0))
    chunk("IDAT", Array.tabulate((seed % 4) + 1)(j => ((seed + j) & 0xff).toByte))
    var i = 1
    while (i < nFrames) {
      chunk("fcTL", fctl(2L * i - 1, i))
      chunk("fdAT", be32a(2L * i) ++
        Array.tabulate((seed + i) % 4 + 1)(j => ((seed + i + j) & 0xff).toByte))
      i += 1
    }
    chunk("IEND", Array.empty[Byte])
    o.toByteArray
  }
}

/** binary → struct<width,height,n_frames,n_plays,frames> parsed by
  * [[ApngKernel.frames]]'s strict CRC-verified walk; NULL on any
  * violation. Corpus-scale: codegen'd static-kernel call.
  */
case class ApngMeta(child: Expression) extends UnaryExpression {

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
    StructField("n_plays", IntegerType, nullable = false),
    StructField("frames", ArrayType(StructType(Seq(
      StructField("w", IntegerType, nullable = false),
      StructField("h", IntegerType, nullable = false),
      StructField("x_off", IntegerType, nullable = false),
      StructField("y_off", IntegerType, nullable = false),
      StructField("delay_num", IntegerType, nullable = false),
      StructField("delay_den", IntegerType, nullable = false),
      StructField("dispose", IntegerType, nullable = false),
      StructField("blend", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    ApngKernel.frames(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.ApngKernel.frames($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "apng_meta"
}

/** (w, h, nFrames, seed) → APNG bytes with real CRC-chunk structure
  * ([[ApngKernel.encodeAnim]]); fixture side, so eval-mode
  * CodegenFallback costs nothing measurable.
  */
case class ApngAnimBytes(children: Seq[Expression])
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
      ApngKernel.encodeAnim(w, h, n, seed)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "apng_anim_bytes"
}
