package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VIDEO-container box walking — the ISO-BMFF (MP4/MOV, ISO/IEC
  * 14496-12) sibling of [[GifKernel]]/[[ApngKernel]]: an MP4 is a tree
  * of length-prefixed boxes (`u32-BE size` + 4cc type, children tiling
  * their parent exactly), so the full sample catalog — per-track codec,
  * geometry, timescale, and every sample's size and duration — comes
  * out of one strict walk over the public box grammar WITHOUT any codec
  * work: frame catalogs are a metadata plane at corpus scale (the codec
  * payload in `mdat` is never read). Reference behavior:
  * `/root/reference` has no media decoding at all (Python orchestration
  * only, `dataflow.py`); this is north-star extension surface.
  *
  * Strictness (NULL on violation, never a guess):
  *  - boxes tile their container exactly, at every level; a box size
  *    below 8 (or a `largesize` below 16), or one overrunning its
  *    parent, rejects. `size==1` 64-bit largesize is honored (bounded
  *    to Int.MaxValue — a single in-memory payload cannot exceed it);
  *    `size==0` ("to end of file") is honored for the LAST top-level
  *    box only, per spec.
  *  - `ftyp` must be the first top-level box; exactly one `moov`;
  *    exactly one `mvhd` per moov, `tkhd`+`mdia` per trak,
  *    `mdhd`+`hdlr`+`minf` per mdia, `stbl` per minf, and
  *    `stsd`+`stts`+`stsz` per stbl (the mandatory sample-table trio);
  *    at least one trak. Unknown box types are SKIPPED at every level —
  *    that is the spec's own forward-compat rule (`free`, `udta`,
  *    `mdat`, `stco`, … walk through here).
  *  - version 0 and 1 full-box layouts both honored for
  *    mvhd/tkhd/mdhd; other versions reject.
  *  - the `stts` run-length total must equal the `stsz` sample count,
  *    and the total is capped at [[Mp4Kernel.MaxSamples]] — a one-box
  *    "claim 2^31 samples" allocation bomb rejects before any array is
  *    sized (the JPEG 64-megapixel-guard precedent).
  */
object Mp4Kernel {

  /** Decode bound: more per-track samples than this rejects (bomb
    * guard; a box claiming N samples must carry 4 bytes each in stsz,
    * but uniform-size stsz and run-length stts can claim counts with
    * O(1) bytes — the cap closes that amplification).
    */
  val MaxSamples = 65536

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String = {
    // 4cc bytes are printable ASCII in every registered type; anything
    // else is treated as corrupt rather than silently round-tripped
    var j = 0
    while (j < 4) {
      val c = b(i + j) & 0xff
      if (c < 0x20 || c > 0x7e) return null
      j += 1
    }
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** ISO-BMFF magic — byte 4..8 == "ftyp" (the sniffing predicate the
    * unified dispatch shares with this kernel).
    */
  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** One parsed box header: (payloadStart, payloadEnd, type). */
  private final class Hdr(val start: Int, val end: Int, val typ: String)

  /** Parse the box header at `pos` within `[pos, limit)`; null on any
    * violation. `lastTopLevel` permits the size==0 to-end-of-file form.
    */
  private def hdr(b: Array[Byte], pos: Int, limit: Int,
                  topLevel: Boolean): Hdr = {
    if (pos + 8 > limit) return null
    val sz = u32(b, pos)
    val typ = fourcc(b, pos + 4)
    if (typ == null) return null
    if (sz == 0) { // to end of file: last top-level box only (spec §4.2)
      if (!topLevel) return null
      new Hdr(pos + 8, limit, typ)
    } else if (sz == 1) {
      if (pos + 16 > limit) return null
      val large = u64(b, pos + 8)
      if (large < 16 || pos + large > limit || large > Int.MaxValue) return null
      new Hdr(pos + 16, pos + large.toInt, typ)
    } else {
      if (sz < 8 || pos + sz > limit) return null
      new Hdr(pos + 8, pos + sz.toInt, typ)
    }
  }

  private final class Track {
    var trackId: Int = -1
    var handler: String = null
    var codec: String = null
    var width: Int = 0
    var height: Int = 0
    var mediaTimescale: Int = -1
    var mediaDuration: Long = -1
    var sizes: Array[Int] = null
    var deltas: Array[Int] = null
  }

  /** Strict catalog walk: struct<major_brand,timescale,duration,
    * n_tracks,tracks array<struct<track_id,handler,codec,width,height,
    * media_timescale,media_duration,n_samples,
    * samples array<struct<size,delta>>>>>, null on any violation.
    */
  def meta(b: Array[Byte]): InternalRow = {
    if (!isMp4(b)) return null
    val len = b.length
    var majorBrand: String = null
    var timescale = -1L
    var duration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var sawMoov = false
    var pos = 0
    var first = true
    while (pos < len) {
      val h = hdr(b, pos, len, topLevel = true)
      if (h == null) return null
      if (first && h.typ != "ftyp") return null
      h.typ match {
        case "ftyp" =>
          if (!first) return null // ftyp is first and unique
          if (h.start + 8 > h.end) return null
          majorBrand = fourcc(b, h.start)
          if (majorBrand == null) return null
        case "moov" =>
          if (sawMoov) return null
          sawMoov = true
          var p = h.start
          while (p < h.end) {
            val c = hdr(b, p, h.end, topLevel = false)
            if (c == null) return null
            c.typ match {
              case "mvhd" =>
                if (timescale >= 0 || c.start + 4 > c.end) return null
                val ver = b(c.start) & 0xff
                if (ver == 0) {
                  if (c.start + 20 > c.end) return null
                  timescale = u32(b, c.start + 12)
                  duration = u32(b, c.start + 16)
                } else if (ver == 1) {
                  if (c.start + 32 > c.end) return null
                  timescale = u32(b, c.start + 20)
                  duration = u64(b, c.start + 24)
                } else return null
              case "trak" =>
                val t = parseTrak(b, c.start, c.end)
                if (t == null) return null
                tracks += t
              case _ => () // udta, meta, … — spec-sanctioned skip
            }
            p = c.end
          }
          if (p != h.end) return null
        case _ => () // mdat, free, skip, … — spec-sanctioned skip
      }
      first = false
      pos = h.end
    }
    if (pos != len || majorBrand == null || !sawMoov || timescale < 0 ||
      timescale > Int.MaxValue || tracks.isEmpty) return null
    val trackRows: Array[Any] = tracks.map { t =>
      val n = t.sizes.length
      val samples = new Array[Any](n)
      var i = 0
      while (i < n) {
        samples(i) = new GenericInternalRow(
          Array[Any](t.sizes(i), t.deltas(i)))
        i += 1
      }
      new GenericInternalRow(Array[Any](
        t.trackId, UTF8String.fromString(t.handler),
        UTF8String.fromString(t.codec), t.width, t.height,
        t.mediaTimescale, t.mediaDuration, n,
        new GenericArrayData(samples))): Any
    }.toArray
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(majorBrand), timescale.toInt, duration,
      tracks.length, new GenericArrayData(trackRows)))
  }

  private def parseTrak(b: Array[Byte], start: Int, end: Int): Track = {
    val t = new Track
    var p = start
    var sawMdia = false
    while (p < end) {
      val c = hdr(b, p, end, topLevel = false)
      if (c == null) return null
      c.typ match {
        case "tkhd" =>
          if (t.trackId >= 0 || c.start + 4 > c.end) return null
          val ver = b(c.start) & 0xff
          // v0: ver/flags 4, ctime 4, mtime 4, track_id 4, reserved 4,
          //     duration 4, tail 60 (reserved 8, layer 2, alt 2, vol 2,
          //     reserved 2, matrix 36, width 4, height 4)
          // v1: 8-byte times and duration
          val (idOff, tailOff) =
            if (ver == 0) (12, 24) else if (ver == 1) (20, 36) else return null
          if (c.start + tailOff + 60 > c.end) return null
          val tid = u32(b, c.start + idOff)
          if (tid > Int.MaxValue) return null
          t.trackId = tid.toInt
          t.width = (u32(b, c.start + tailOff + 52) >>> 16).toInt
          t.height = (u32(b, c.start + tailOff + 56) >>> 16).toInt
        case "mdia" =>
          if (sawMdia) return null
          sawMdia = true
          if (!parseMdia(b, c.start, c.end, t)) return null
        case _ => () // edts, … — skip
      }
      p = c.end
    }
    if (p != end || t.trackId < 0 || !sawMdia) return null
    t
  }

  private def parseMdia(b: Array[Byte], start: Int, end: Int,
                        t: Track): Boolean = {
    var p = start
    var sawMinf = false
    while (p < end) {
      val c = hdr(b, p, end, topLevel = false)
      if (c == null) return false
      c.typ match {
        case "mdhd" =>
          if (t.mediaTimescale >= 0 || c.start + 4 > c.end) return false
          val ver = b(c.start) & 0xff
          val mts =
            if (ver == 0) {
              if (c.start + 20 > c.end) return false
              t.mediaDuration = u32(b, c.start + 16)
              u32(b, c.start + 12)
            } else if (ver == 1) {
              if (c.start + 32 > c.end) return false
              t.mediaDuration = u64(b, c.start + 24)
              u32(b, c.start + 20)
            } else return false
          if (mts > Int.MaxValue) return false
          t.mediaTimescale = mts.toInt
        case "hdlr" =>
          if (t.handler != null || c.start + 12 > c.end) return false
          t.handler = fourcc(b, c.start + 8)
          if (t.handler == null) return false
        case "minf" =>
          if (sawMinf) return false
          sawMinf = true
          if (!parseMinf(b, c.start, c.end, t)) return false
        case _ => ()
      }
      p = c.end
    }
    p == end && t.mediaTimescale >= 0 && t.handler != null && sawMinf
  }

  private def parseMinf(b: Array[Byte], start: Int, end: Int,
                        t: Track): Boolean = {
    var p = start
    var sawStbl = false
    while (p < end) {
      val c = hdr(b, p, end, topLevel = false)
      if (c == null) return false
      if (c.typ == "stbl") {
        if (sawStbl) return false
        sawStbl = true
        if (!parseStbl(b, c.start, c.end, t)) return false
      } // vmhd/smhd/dinf — skip
      p = c.end
    }
    p == end && sawStbl
  }

  private def parseStbl(b: Array[Byte], start: Int, end: Int,
                        t: Track): Boolean = {
    var p = start
    var uniformSize = -1L
    var uniformCount = -1L
    while (p < end) {
      val c = hdr(b, p, end, topLevel = false)
      if (c == null) return false
      c.typ match {
        case "stsd" =>
          if (t.codec != null || c.start + 8 > c.end) return false
          if (u32(b, c.start) != 0) return false // version+flags
          val nEntries = u32(b, c.start + 4)
          if (nEntries < 1) return false
          // entries are boxes themselves; the FIRST entry's 4cc is the
          // codec (walk validates all entries tile the stsd payload)
          var q = c.start + 8
          var i = 0L
          while (i < nEntries) {
            val e = hdr(b, q, c.end, topLevel = false)
            if (e == null) return false
            if (i == 0) t.codec = e.typ
            q = e.end
            i += 1
          }
          if (q != c.end) return false
        case "stts" =>
          if (t.deltas != null || c.start + 8 > c.end) return false
          if (u32(b, c.start) != 0) return false
          val nEntries = u32(b, c.start + 4)
          if (c.start + 8 + nEntries * 8 != c.end) return false
          var total = 0L
          var i = 0
          while (i < nEntries) {
            total += u32(b, c.start + 8 + i * 8)
            if (total > MaxSamples) return false // bomb guard
            i += 1
          }
          val deltas = new Array[Int](total.toInt)
          var k = 0
          i = 0
          while (i < nEntries) {
            val cnt = u32(b, c.start + 8 + i * 8).toInt
            val dlt = u32(b, c.start + 12 + i * 8)
            if (dlt > Int.MaxValue) return false
            var j = 0
            while (j < cnt) { deltas(k) = dlt.toInt; k += 1; j += 1 }
            i += 1
          }
          t.deltas = deltas
        case "stsz" =>
          if (t.sizes != null || uniformSize >= 0 ||
            c.start + 12 > c.end) return false
          if (u32(b, c.start) != 0) return false
          val sz = u32(b, c.start + 4)
          val cnt = u32(b, c.start + 8)
          if (sz == 0) {
            if (cnt > MaxSamples ||
              c.start + 12 + cnt * 4 != c.end) return false
            val sizes = new Array[Int](cnt.toInt)
            var i = 0
            while (i < cnt) {
              val v = u32(b, c.start + 12 + i * 4)
              if (v > Int.MaxValue) return false
              sizes(i) = v.toInt
              i += 1
            }
            t.sizes = sizes
          } else {
            if (cnt > MaxSamples || sz > Int.MaxValue ||
              c.start + 12 != c.end) return false
            uniformSize = sz
            uniformCount = cnt
          }
        case _ => () // stco, stsc, ctts, stss — skip
      }
      p = c.end
    }
    if (p != end || t.codec == null || t.deltas == null) return false
    if (t.sizes == null) {
      if (uniformSize < 0) return false // no stsz at all
      if (uniformCount != t.deltas.length) return false
      val sizes = new Array[Int](uniformCount.toInt)
      java.util.Arrays.fill(sizes, uniformSize.toInt)
      t.sizes = sizes
    }
    t.sizes.length == t.deltas.length // stts total == stsz count
  }

  // ------------------------------------------------------------------
  // Fixture-side encoder
  // ------------------------------------------------------------------

  /** Fixture-side single-video-track MP4 encoder: a genuine ISO-BMFF
    * tree — ftyp(isom) + mdat (zero-filled, honestly sized to the
    * sample table) + moov(mvhd + trak(tkhd + mdia(mdhd + hdlr(vide) +
    * minf(vmhd + dinf + stbl(stsd(avc1) + stts + stsz + stsc +
    * stco))))) with real chunk offsets into mdat — whose planted
    * parameters derive from (w, h, nSamples, seed) by the fixed
    * arithmetic below, so an oracle replays every field without parsing
    * a byte:
    *   timescale = 600·(seed%4+1); delta_i = (seed+7i)%100+1;
    *   size_i = (seed+11i)%900+100; duration = Σ delta_i (movie and
    *   media timescales equal by construction).
    */
  def encodeMp4(w: Int, h: Int, nSamples: Int, seed: Int): Array[Byte] = {
    require(nSamples >= 1 && nSamples <= 4096,
      s"nSamples out of range: $nSamples")
    require(seed >= 0, s"seed must be non-negative: $seed")
    val ts = 600 * (seed % 4 + 1)
    val deltas = Array.tabulate(nSamples)(i => (seed + 7 * i) % 100 + 1)
    val sizes = Array.tabulate(nSamples)(i => (seed + 11 * i) % 900 + 100)
    encode(w, h, ts, deltas, sizes)
  }

  /** Flexible encoder core: explicit timescale and per-sample
    * delta/size arrays (run-length coalescing in `stts` falls out of
    * the arrays' repeat structure — the spec-testable surface the
    * arithmetic wrapper above can't reach).
    */
  def encode(w: Int, h: Int, ts: Int,
             deltas: Array[Int], sizes: Array[Int]): Array[Byte] = {
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff,
      s"frame size out of range: ${w}x$h")
    require(ts >= 1, s"timescale must be positive: $ts")
    require(deltas.length == sizes.length && deltas.nonEmpty &&
      deltas.length <= 4096, "deltas/sizes must align, 1..4096 samples")
    val nSamples = deltas.length
    val mdur = deltas.map(_.toLong).sum
    // the version-0 boxes below carry 32-bit durations — be32 would
    // silently truncate a larger sum and meta() would parse the wrapped
    // value with no error pointing back here
    require(mdur >= 0 && mdur <= 0xffffffffL,
      s"duration sum $mdur exceeds the version-0 32-bit duration field")
    val mdatPayload = sizes.map(_.toLong).sum
    require(mdatPayload <= Int.MaxValue, "mdat too large")

    def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def cc(o: java.io.ByteArrayOutputStream, s: String): Unit = {
      require(s.length == 4); s.foreach(ch => o.write(ch.toInt))
    }
    def box(typ: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      body(o)
      val payload = o.toByteArray
      val out = new java.io.ByteArrayOutputStream(payload.length + 8)
      be32(out, payload.length + 8L); cc(out, typ); out.write(payload)
      out.toByteArray
    }

    val ftyp = box("ftyp") { o =>
      cc(o, "isom"); be32(o, 0x200); cc(o, "isom"); cc(o, "avc1")
    }
    // mdat before moov (legal, and makes chunk offsets computable
    // without patching): chunk 0 starts right after the mdat header
    val chunkOffset = ftyp.length + 8L
    val mdat = box("mdat")(o => o.write(new Array[Byte](mdatPayload.toInt)))

    val stsd = box("stsd") { o =>
      be32(o, 0); be32(o, 1)
      // minimal VisualSampleEntry: 8 header + 78 zero payload = 86
      be32(o, 86); cc(o, "avc1"); o.write(new Array[Byte](78))
    }
    val stts = box("stts") { o =>
      // run-length coalesce consecutive equal deltas (the walker must
      // expand runs back out; OpsSpec pins a constant-delta single run)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      deltas.foreach { d =>
        if (runs.nonEmpty && runs.last._2 == d)
          runs(runs.length - 1) = (runs.last._1 + 1, d)
        else runs += ((1, d))
      }
      be32(o, 0) // FullBox version+flags
      be32(o, runs.length)
      runs.foreach { case (cnt, d) => be32(o, cnt); be32(o, d) }
    }
    val stsz = box("stsz") { o =>
      be32(o, 0); be32(o, 0); be32(o, nSamples)
      sizes.foreach(s => be32(o, s))
    }
    val stsc = box("stsc") { o =>
      be32(o, 0); be32(o, 1); be32(o, 1); be32(o, nSamples); be32(o, 1)
    }
    val stco = box("stco") { o => be32(o, 0); be32(o, 1); be32(o, chunkOffset) }
    val stbl = box("stbl") { o =>
      o.write(stsd); o.write(stts); o.write(stsz); o.write(stsc); o.write(stco)
    }
    val vmhd = box("vmhd") { o =>
      be32(o, 1); o.write(new Array[Byte](8)) // version/flags=1, graphics+opcolor
    }
    val dinf = box("dinf") { o =>
      val dref = box("dref") { d =>
        be32(d, 0); be32(d, 1)
        val url = box("url ")(u => be32(u, 1)) // self-contained flag
        d.write(url)
      }
      o.write(dref)
    }
    val minf = box("minf") { o => o.write(vmhd); o.write(dinf); o.write(stbl) }
    val hdlr = box("hdlr") { o =>
      be32(o, 0); be32(o, 0); cc(o, "vide"); o.write(new Array[Byte](12))
      "VideoHandler".foreach(ch => o.write(ch.toInt)); o.write(0)
    }
    val mdhd = box("mdhd") { o =>
      be32(o, 0); be32(o, 0); be32(o, 0); be32(o, ts); be32(o, mdur)
      o.write(0x55); o.write(0xc4); o.write(0); o.write(0) // und, predefined
    }
    val mdia = box("mdia") { o => o.write(mdhd); o.write(hdlr); o.write(minf) }
    val tkhd = box("tkhd") { o =>
      be32(o, 7) // version 0, flags enabled|in-movie|in-preview
      be32(o, 0); be32(o, 0); be32(o, 1); be32(o, 0); be32(o, mdur)
      o.write(new Array[Byte](16)) // reserved, layer, alt, volume, reserved
      // identity matrix (16.16 / 2.30 fixed point)
      be32(o, 0x10000); be32(o, 0); be32(o, 0)
      be32(o, 0); be32(o, 0x10000); be32(o, 0)
      be32(o, 0); be32(o, 0); be32(o, 0x40000000)
      be32(o, w.toLong << 16); be32(o, h.toLong << 16)
    }
    val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
    val mvhd = box("mvhd") { o =>
      be32(o, 0); be32(o, 0); be32(o, 0); be32(o, ts); be32(o, mdur)
      be32(o, 0x10000) // rate 1.0
      o.write(0x01); o.write(0); o.write(0); o.write(0) // volume 1.0 + reserved
      o.write(new Array[Byte](8))
      be32(o, 0x10000); be32(o, 0); be32(o, 0)
      be32(o, 0); be32(o, 0x10000); be32(o, 0)
      be32(o, 0); be32(o, 0); be32(o, 0x40000000)
      o.write(new Array[Byte](24)) // pre_defined
      be32(o, 2) // next_track_ID
    }
    val moov = box("moov") { o => o.write(mvhd); o.write(trak) }

    val out = new java.io.ByteArrayOutputStream(
      ftyp.length + mdat.length + moov.length)
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }
}

/** binary → struct<major_brand,timescale,duration,n_tracks,tracks>
  * parsed by [[Mp4Kernel.meta]]'s strict box walk; NULL on any grammar
  * violation. Corpus-scale: codegen'd static-kernel call.
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("tracks", ArrayType(StructType(Seq(
      StructField("track_id", IntegerType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("media_timescale", IntegerType, nullable = false),
      StructField("media_duration", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("samples", ArrayType(StructType(Seq(
        StructField("size", IntegerType, nullable = false),
        StructField("delta", IntegerType, nullable = false))),
        containsNull = false), nullable = false))),
      containsNull = false), nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    Mp4Kernel.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Mp4Kernel.meta($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "mp4_meta"
}

/** (w, h, nSamples, seed) → real single-track MP4 bytes
  * ([[Mp4Kernel.encodeMp4]]); fixture side, so eval-mode
  * CodegenFallback costs nothing measurable.
  */
case class Mp4Bytes(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 && children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 4 int args (w, h, nSamples, seed)")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(w, h, n, seed) = vs.map(_.asInstanceOf[Int])
      Mp4Kernel.encodeMp4(w, h, n, seed)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "mp4_bytes"
}
