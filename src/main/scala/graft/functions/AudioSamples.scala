package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL PCM sample decode — the step past [[WavHeaderKernel]]'s container
  * parsing, the audio sibling of [[PngPixelKernel]]: the WAV `data` chunk
  * IS the sample stream (RIFF stores raw LPCM), so amplitude statistics
  * come from genuinely decoded samples with one chunk walk + one pass
  * over the payload. 8-bit PCM is UNSIGNED with midpoint 128 (amplitude
  * = byte − 128); 16-bit PCM is SIGNED little-endian — both public
  * fixed-layout rules, integer-exact, so an oracle replays every sample.
  *
  * Scope (NULL outside it): format code 1 (integer PCM), 8- or 16-bit,
  * a data chunk whose size tiles by the block align. Mean/RMS-style
  * gates run on the reported exact integer sums.
  */
object WavPcmKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, a: Char, c: Char, d: Char, e: Char) =
    b(i) == a && b(i + 1) == c && b(i + 2) == d && b(i + 3) == e

  /** RIFF/WAVE container magic — the sniffing predicate
    * [[graft.ops.Multimodal.extractFeatures]] shares with this kernel
    * (one definition, so sniffing can't drift from decoder scope).
    */
  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      tag(b, 0, 'R', 'I', 'F', 'F') && tag(b, 8, 'W', 'A', 'V', 'E')

  private final class PcmFmt(val channels: Int, val bits: Int,
                             val rate: Long, val dataOff: Int,
                             val dataSize: Long)

  /** One chunk walk shared by [[stats]] and [[statsWithFmt]]; null
    * outside the sample-decode scope (8/16-bit integer PCM, complete
    * chunks, frame-aligned data).
    */
  private def parsePcm(b: Array[Byte]): PcmFmt = {
    if (b == null || b.length < 44 || !isWav(b)) return null
    var i = 12
    var fmtSeen = false
    var channels = 0
    var bits = 0
    var rate = 0L
    var dataOff = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return null
      if (tag(b, i, 'f', 'm', 't', ' ')) {
        if (size < 16) return null
        val p = i + 8
        if (le16(b, p) != 1) return null // integer PCM only at sample level
        channels = le16(b, p + 2)
        rate = le32(b, p + 4)
        bits = le16(b, p + 14)
        fmtSeen = true
      } else if (tag(b, i, 'd', 'a', 't', 'a')) {
        dataOff = i + 8
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtSeen || dataOff < 0) return null
    if (channels < 1 || (bits != 8 && bits != 16)) return null
    if (dataSize % (channels * (bits / 8)) != 0) return null // ragged frames
    new PcmFmt(channels, bits, rate, dataOff, dataSize)
  }

  /** (n, sum, sumAbs, min, max) over the decoded amplitudes. */
  private def amplitudeStats(b: Array[Byte], f: PcmFmt): Array[Long] = {
    val bytesPer = f.bits / 8
    val n = (f.dataSize / bytesPer).toInt
    var sum = 0L
    var sumAbs = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var s = 0
    while (s < n) {
      val amp =
        if (f.bits == 8) u8(b, f.dataOff + s) - 128
        else {
          val v = le16(b, f.dataOff + s * 2)
          if (v >= 0x8000) v - 0x10000 else v // sign-extend 16-bit LE
        }
      sum += amp
      sumAbs += math.abs(amp)
      if (amp < mn) mn = amp
      if (amp > mx) mx = amp
      s += 1
    }
    if (n == 0) { mn = 0; mx = 0 }
    Array(n.toLong, sum, sumAbs, mn.toLong, mx.toLong)
  }

  /** null unless `b` is a complete parseable 8/16-bit integer-PCM WAV;
    * otherwise (n_samples, sum_amp, sum_abs, min_amp, max_amp) over the
    * decoded amplitudes. Zero-sample files report (0, 0, 0, 0, 0).
    */
  def stats(b: Array[Byte]): InternalRow = {
    val f = parsePcm(b)
    if (f == null) return null
    val a = amplitudeStats(b, f)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2), a(3).toInt, a(4).toInt))
  }

  /** [[stats]] plus the fmt fields feature extraction needs —
    * (n_samples, sum_amp, sum_abs, min_amp, max_amp, sample_rate,
    * channels) — from the SAME single chunk walk + sample pass (the
    * feature path used to re-walk the whole container through
    * [[WavHeaderKernel]] just to read rate and channels).
    */
  def statsWithFmt(b: Array[Byte]): InternalRow = {
    val f = parsePcm(b)
    if (f == null) return null
    val a = amplitudeStats(b, f)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2), a(3).toInt, a(4).toInt,
      f.rate, f.channels))
  }

  /** 64-bit time-domain AUDIO fingerprint — the audio sibling of
    * [[DHashKernel]], a Haitsma–Kalker-style (ISMIR'02) energy-DIFFERENCE
    * hash simplified to the time axis so every stage stays integer-exact
    * and SQL-replayable: decode amplitudes, fold |amp| into 64 equal
    * windows (sample s → window ⌊s·64/n⌋, the same floor rule as
    * [[PngPixelKernel.resize]]), bit k (k ≥ 1) set iff E(k) > E(k−1).
    * Survives re-encoding, volume-preserving container churn, and
    * resampling at the window scale — the near-dup signature for audio
    * corpora, riding [[graft.ops.Dedup.hamming64Pairs]]' banding like
    * text SimHash and image dHash do. NULL outside the PCM decode scope
    * or for zero-sample streams (no signal, no signature).
    */
  def fingerprint64(b: Array[Byte]): java.lang.Long = {
    val f = parsePcm(b)
    if (f == null) return null
    val bytesPer = f.bits / 8
    val n = (f.dataSize / bytesPer).toInt
    if (n == 0) return null
    val e = new Array[Long](64)
    var s = 0
    while (s < n) {
      val amp =
        if (f.bits == 8) u8(b, f.dataOff + s) - 128
        else {
          val v = le16(b, f.dataOff + s * 2)
          if (v >= 0x8000) v - 0x10000 else v
        }
      e((s.toLong * 64 / n).toInt) += math.abs(amp)
      s += 1
    }
    var bits = 0L
    var k = 1
    while (k < 64) {
      if (e(k) > e(k - 1)) bits |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(bits)
  }

  /** Fixture-side REAL WAV encoder with a deterministic non-silent
    * payload: flattened sample index i carries
    *   8-bit:  byte  (i·37 + 11) mod 256          (amplitude = that − 128)
    *   16-bit: value ((i·1031 + 7) mod 65536) − 32768, little-endian
    * — closed-form in i, so a SQL oracle verifies genuine sample decode
    * end-to-end (the [[PngEncodeKernel]] pattern for audio). Complete
    * RIFF + fmt + data layout; [[WavPcmKernel.stats]] treats these bytes
    * exactly like encoder output from the wild.
    */
  def encodeTone(channels: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 64, s"channels out of [1, 64]: $channels")
    require(bits == 8 || bits == 16, s"tone fixture is 8/16-bit, got $bits")
    require(frames >= 0 && frames <= 4096, s"frames out of [0, 4096]: $frames")
    require(rate >= 1 && rate <= 2000000, s"rate out of [1, 2e6]: $rate")
    val bytesPer = bits / 8
    val n = frames * channels
    val dataSize = n * bytesPer
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort).putInt(rate)
    out.putInt(rate * channels * bytesPer) // byte rate
    out.putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      if (bits == 8) out.put(((i * 37 + 11) % 256).toByte)
      else out.putShort((((i * 1031 + 7) % 65536) - 32768).toShort)
      i += 1
    }
    out.array()
  }
}

/** binary → struct<n_samples,sum_amp,sum_abs,min_amp,max_amp> from
  * genuinely decoded PCM samples; NULL outside [[WavPcmKernel]]'s
  * documented scope. Corpus-scale: codegen'd static-kernel call.
  */
case class AudioPcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("min_amp", IntegerType, nullable = false),
    StructField("max_amp", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    WavPcmKernel.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WavPcmKernel.stats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_pcm_stats"
}

/** (channels, rate, bits, frames) → real tone-filled WAV bytes
  * ([[WavPcmKernel.encodeTone]]); fixture side, so eval-mode
  * CodegenFallback costs nothing measurable.
  */
case class WavToneBytes(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 && children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 4 int args (channels, rate, bits, frames)")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(ch, rate, bits, frames) = vs.map(_.asInstanceOf[Int])
      WavPcmKernel.encodeTone(ch, rate, bits, frames)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "wav_tone_bytes"
}

/** binary → bigint 64-bit audio fingerprint via
  * [[WavPcmKernel.fingerprint64]]; NULL outside the PCM decode scope.
  * Corpus-scale: codegen'd static-kernel call.
  */
case class AudioFingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val v = WavPcmKernel.fingerprint64(input.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long ${ev.value}_fp = graft.functions.WavPcmKernel.fingerprint64($c);
       |if (${ev.value}_fp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_fp.longValue(); }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_fingerprint64"
}
