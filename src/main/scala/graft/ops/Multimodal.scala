package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in PARTITION-SIZED BATCHES.
  *
  * Three decode tiers:
  *   - [[imageMeta]] / [[audioMeta]]: REAL container-header decoding —
  *     PNG IHDR / JPEG SOFn / WAV fmt chunks parsed from actual bytes by
  *     native codegen expressions; q32/q103 run them over real
  *     constructed bytes under DuckDB oracles.
  *   - [[pngPixelStats]]: REAL pixel decoding — PNG IDAT is zlib
  *     (`java.util.zip.Inflater`, in the JDK), scanline filters are
  *     public byte arithmetic, so full decode to channel statistics
  *     needs no codec library. q110 decodes genuine deflated bytes under
  *     a closed-form DuckDB oracle; PngPixelSpec cross-checks against
  *     the JDK's independent ImageIO decoder.
  *   - Unified feature extraction ([[extractFeatures]]): content-sniffed
  *     magic dispatches each payload to its REAL decoder — PNG (hand-
  *     rolled zlib+defilter), JPEG (JDK ImageIO codec), WAV (LPCM sample
  *     decode). Only payloads no real decoder claims (video and other
  *     formats whose codecs this container doesn't carry, or corrupt
  *     bytes) fall to the clearly-marked `decodeStub`, reported as
  *     `decoded = "stub"`. In production the same `mapPartitions`
  *     boundary hosts the JNI/FFmpeg-equivalent call for those,
  *     batch-at-a-time so codec initialization amortizes across a
  *     partition — the property that matters at 100 TB.
  */
object Multimodal {

  /** Parse real PNG/JPEG container headers from a binary column:
    * struct<format,width,height,channels,bit_depth>, NULL when the payload
    * is not a parseable image — corrupt media filters as data, it never
    * throws. Native expression, stays inside whole-stage codegen.
    */
  def imageMeta(bytes: Column): Column = graft.functions.ArrayMath.imageMeta(bytes)

  /** REAL PNG header bytes (signature + IHDR) assembled from dimension
    * columns with codegen built-ins only (hex/lpad/concat/unhex) — the
    * fixture-side encoder that lets a query round-trip [[imageMeta]] over
    * genuine bytes with a SQL-replayable oracle. Channels pick the colour
    * type: 1→greyscale, 2→grey+alpha, 3→truecolour, 4→truecolour+alpha.
    */
  def pngHeaderBytes(width: Column, height: Column, channels: Column): Column = {
    val colorType = when(channels === 1, lit(0)).when(channels === 2, lit(4))
      .when(channels === 3, lit(2)).otherwise(lit(6))
    unhex(concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR chunk: length 13 + type
      lpad(hex(width.cast("int")), 8, "0"),
      lpad(hex(height.cast("int")), 8, "0"),
      lit("08"), lpad(hex(colorType), 2, "0"),
      lit("000000"))) // compression, filter, interlace
  }

  /** REAL JPEG header bytes: SOI, a COM segment (the parser must walk
    * past it), a SOF0 frame header carrying the dimensions, EOI. Same
    * built-ins-only contract as [[pngHeaderBytes]]. `nComponents` must be
    * 1 (greyscale) or 3 (YCbCr) — the two layouts real encoders emit.
    * SOF dimension fields are 16-bit (the JPEG format limit) — out-of-
    * range dimensions fail the job loudly instead of lpad silently
    * truncating the hex into a wrong-but-parseable header.
    */
  def jpegHeaderBytes(width: Column, height: Column, nComponents: Column): Column = {
    val comps = when(nComponents === 1, lit("011100"))
      .otherwise(lit("011100021101031101")) // (id, sampling, qtable) per comp
    val segLen = when(nComponents === 1, lit("000B")).otherwise(lit("0011")) // 8 + 3*n
    val w16 = assertInRange(width, 1, 65535, "jpeg width")
    val h16 = assertInRange(height, 1, 65535, "jpeg height")
    unhex(concat(
      lit("FFD8"), lit("FFFE0004ABCD"), // SOI + 4-byte COM segment
      lit("FFC0"), segLen, lit("08"), // SOF0, length, precision
      lpad(hex(h16.cast("int")), 4, "0"),
      lpad(hex(w16.cast("int")), 4, "0"),
      lpad(hex(nComponents.cast("int")), 2, "0"),
      comps, lit("FFD9")))
  }

  /** WAV header metadata parsed from real RIFF bytes (see
    * [[graft.functions.AudioMeta]]) — the audio sibling of [[imageMeta]].
    */
  def audioMeta(bytes: Column): Column = graft.functions.ArrayMath.audioMeta(bytes)

  /** REAL PNG pixel decode → struct<width,height,channels,mean_r,mean_g,
    * mean_b>: zlib-inflate the IDAT stream, invert all five scanline
    * filter types, reduce samples to per-channel means; CRCs verified,
    * NULL outside the documented scope (8-bit grey/RGB/RGBA,
    * non-interlaced, ≤64 MiB raw — see
    * [[graft.functions.PngPixelKernel]]). This replaces the last labeled
    * multimodal stub: the bytes go through a genuine decoder.
    */
  def pngPixelStats(bytes: Column): Column =
    graft.functions.ArrayMath.pngPixelStats(bytes)

  /** Fixture-side REAL PNG encoder: 8-bit RGB gradient pixels
    * ((r0+x+y)%256, ...) with scanline filters cycling through all five
    * PNG types, deflated and CRC'd for real — so a SQL oracle can verify
    * [[pngPixelStats]]'s decode end-to-end from closed-form means (see
    * [[graft.functions.PngEncodeKernel]]).
    */
  def pngGradientBytes(w: Column, h: Column, r0: Column, g0: Column,
                       b0: Column): Column =
    graft.functions.ArrayMath.pngGradientBytes(w, h, r0, g0, b0)

  /** Genuine-decode nearest-neighbor resize: PNG bytes → struct<width,
    * height,channels,pixels> at (outW, outH), source pixel ⌊x·w/outW⌋ —
    * integer-exact, so oracles replay the mapping. The packed `pixels`
    * buffer feeds [[rgbChannelStats]] (or any downstream feature op)
    * without a second decode. NULL outside decode scope.
    */
  def pngResize(bytes: Column, outW: Column, outH: Column): Column =
    graft.functions.ArrayMath.pngResize(bytes, outW, outH)

  /** 64-bit average-hash (aHash) perceptual image fingerprint — the
    * classic near-duplicate-image key (the simplest member of the
    * aHash/dHash/pHash family; see Zauner 2010 "Implementation and
    * Benchmarking of Perceptual Image Hash Functions"): genuinely
    * decode, nearest-neighbor sample an 8×8 grid (the
    * [[graft.functions.PngPixelKernel.resize]] ⌊x·w/8⌋ floor rule —
    * real inflate+defilter), reduce each pixel to 3·gray (r+g+b —
    * scale keeps every comparison integer), set bit (63 − i) of the
    * hash (row-major pixel i) iff
    *
    *   64·gray3(i) > Σ gray3   (the cross-multiplied "above mean" test
    *                            — division-free, engine-exact)
    *
    * Bit 63 lands on the long's sign (1L << 63 = Long.MinValue); every
    * partial sum stays in range, so the signed value IS the bit
    * pattern and feeds [[graft.ops.Dedup.hamming64Pairs]] /
    * [[hamming64Degrees]] unchanged — image near-dup clustering rides
    * the existing banded machinery. Hash equality across rotations of
    * a flat image is expected (aHash is the cheap tier; its job is
    * exact/near-exact copies and recompressions).
    *
    * ONE native codegen'd kernel call, ONE decode per row
    * ([[graft.functions.AHash64]] — the same static-kernel shape as
    * [[imageDHash]]'s `DHash64`; the prior expression composition of
    * interpreted higher-order functions re-ran the full PNG decode per
    * bit per element and could not finish a bench rep — never nest a
    * decode inside a Spark lambda, HOFs are CodegenFallback). Zero
    * shuffle. NULL for payloads outside decode scope. Despite the
    * legacy name, dispatch is by content magic: PNG and JPEG both
    * hash (the [[imageDHash]] parity). Grey images use 3·grey; RGBA
    * alpha is ignored (the [[pngPixelStats]] convention).
    */
  def pngAHash(bytes: Column): Column =
    graft.functions.ArrayMath.imageAHash64(bytes)

  /** Exact per-channel integer sums over a packed interleaved 8-bit
    * buffer: struct<n_px,sum_r,sum_g,sum_b>. Grey buffers report the
    * value on all three channels; alpha is excluded (the [[pngPixelStats]]
    * convention).
    */
  def rgbChannelStats(pixels: Column, channels: Column): Column =
    graft.functions.ArrayMath.rgbChannelStats(pixels, channels)

  /** Genuine JPEG pixel decode through the JDK's own ImageIO codec
    * (Huffman + IDCT in the platform decoder — no external library):
    * struct<width,height,mean_r,mean_g,mean_b>. JPEG is lossy, so means
    * verify against a tolerance band, not bit-for-bit.
    */
  def jpegPixelStats(bytes: Column): Column =
    graft.functions.ArrayMath.jpegPixelStats(bytes)

  /** Fixture-side REAL JPEG encoder (ImageIO write path — genuine DCT
    * quantization) of the [[pngGradientBytes]] gradient.
    */
  def jpegGradientBytes(w: Column, h: Column, r0: Column, g0: Column,
                        b0: Column): Column =
    graft.functions.ArrayMath.jpegGradientBytes(w, h, r0, g0, b0)

  /** Genuine PCM sample decode over a WAV payload: amplitude statistics
    * struct<n_samples,sum_amp,sum_abs,min_amp,max_amp> from the decoded
    * data chunk (8-bit unsigned-midpoint / 16-bit signed LE — the public
    * LPCM rules), integer-exact so oracles replay every sample. The
    * silence/clipping gates a speech-corpus pipeline runs come straight
    * off these sums.
    */
  def audioPcmStats(bytes: Column): Column =
    graft.functions.ArrayMath.audioPcmStats(bytes)

  /** Fixture-side REAL tone-filled WAV encoder: closed-form sawtooth
    * samples (see [[graft.functions.WavPcmKernel.encodeTone]]), complete
    * RIFF layout.
    */
  def wavToneBytes(channels: Column, rate: Column, bits: Column,
                   frames: Column): Column =
    graft.functions.ArrayMath.wavToneBytes(channels, rate, bits, frames)

  /** A REAL complete PCM WAV file (RIFF + fmt + zero-filled data chunk)
    * assembled from parameter columns with codegen built-ins only — the
    * fixture-side encoder that lets a query round-trip [[audioMeta]] over
    * genuine bytes with a SQL-replayable oracle. WAV fields are LITTLE-
    * endian: each value's hex is byte-reversed before concatenation.
    * `nFrames` is bounded (≤ 4096) because the data chunk is physically
    * materialized at `nFrames · channels · bits/8` bytes per row.
    */
  def wavBytes(channels: Column, sampleRate: Column, bitsPerSample: Column,
               nFrames: Column): Column = {
    def le(c: Column, nBytes: Int): Column = {
      val h = lpad(hex(c.cast("long")), nBytes * 2, "0")
      concat((0 until nBytes).reverse.map(k => substring(h, k * 2 + 1, 2)): _*)
    }
    val ch = assertInRange(channels, 1, 64, "wav channels")
    val bits = assertInRange(bitsPerSample, 8, 32, "wav bits")
    val frames = assertInRange(nFrames, 0, 4096, "wav frames")
    // byteRate = rate * block must fit its 4-byte LE field (le() lpads, so
    // wider values would silently truncate — the jpegHeaderBytes trap):
    // 2 MHz * max block (64ch * 4B) = 5.1e8 < 2^32
    val rate = assertInRange(sampleRate, 1, 2000000, "wav sample rate")
    val block = ch * (bits.cast("int") / lit(8)).cast("int")
    val dataSize = frames * block
    val byteRate = rate * block
    unhex(concat(
      lit("52494646"), le(dataSize + lit(36), 4), lit("57415645"), // RIFF WAVE
      lit("666D7420"), le(lit(16), 4), // "fmt " chunk, 16 payload bytes
      le(lit(1), 2), le(ch, 2), le(rate, 4), le(byteRate, 4),
      le(block, 2), le(bits, 2),
      lit("64617461"), le(dataSize, 4), // "data" chunk
      repeat(lit("00"), dataSize.cast("int"))))
  }

  /** Distributed range guard: evaluates to `c`, fails the task when out
    * of [lo, hi] — the assert_true pattern (no driver-side scan).
    */
  private def assertInRange(c: Column, lo: Int, hi: Int, what: String): Column =
    when(assert_true(c.between(lo, hi),
      lit(s"$what out of [$lo, $hi]")).isNull, c)

  /** media struct: raw bytes + typed metadata. */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)

  /** `format` is the claimed container from metadata; `decoded` is the
    * decoder lane the payload ACTUALLY took, decided by content sniffing
    * ("png" | "jpeg" | "wav" | "stub") — a mislabeled or corrupt payload
    * reports the truth here instead of inheriting its label.
    */
  final case class MediaFeatures(media_id: Long, format: String, decoded: String,
                                 features: Array[Float])

  /** Pack any binary-bearing DataFrame into the canonical media schema.
    * For fixtures we treat document text bytes as the opaque payload.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("text/plain").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        coalesce(length(col("text").cast("binary")).cast("long"), lit(0L)).as("nBytes")).as("meta"))

  /** STUB decode kernel: deterministic fake "decoder" folding the payload
    * into an 8-float feature vector — lane j = (Σ of bytes at positions
    * ≡ j mod 8) / 255, accumulated EXACTLY in integers and rounded to
    * float once per lane. The exact-integer spelling makes the value
    * reproducible in any engine (OpsSpec recomputes it from the UTF-8
    * bytes), unlike per-byte float accumulation whose rounding order no
    * SQL engine can replay. Replace the body with the real codec call
    * (same signature, same batching) in production. Real header-level
    * decode is [[imageMeta]].
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** REAL feature lanes for an in-scope PNG payload (genuine zlib decode
    * via [[graft.functions.PngPixelKernel]]): [width, height, channels,
    * mean_r, mean_g, mean_b, Rec.601 luminance of the means, n_px].
    * null when the payload is not a decodable PNG.
    */
  private def pngFeatures(bytes: Array[Byte]): Array[Float] = {
    val img = graft.functions.PngPixelKernel.decodeImage(bytes)
    if (img == null) return null
    val st = graft.functions.PngPixelKernel.channelStats(img.samples, img.channels)
    val n = (img.width.toLong * img.height).toDouble
    val (mr, mg, mb) = (st.getLong(1) / n, st.getLong(2) / n, st.getLong(3) / n)
    Array(img.width.toFloat, img.height.toFloat, img.channels.toFloat,
      mr.toFloat, mg.toFloat, mb.toFloat,
      (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat, n.toFloat)
  }

  /** REAL feature lanes for a JPEG payload (JDK ImageIO codec — Huffman +
    * IDCT in the platform decoder, see [[graft.functions.JpegPixelKernel]]):
    * same lane map as [[pngFeatures]] (JPEG decodes to RGB, so channels
    * reports 3). null when the payload is not a decodable JPEG.
    */
  private def jpegFeatures(bytes: Array[Byte]): Array[Float] = {
    val st = graft.functions.JpegPixelKernel.decode(bytes)
    if (st == null) return null
    val w = st.getInt(0)
    val h = st.getInt(1)
    val (mr, mg, mb) = (st.getDouble(2), st.getDouble(3), st.getDouble(4))
    Array(w.toFloat, h.toFloat, 3f, mr.toFloat, mg.toFloat, mb.toFloat,
      (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat, (w.toLong * h).toFloat)
  }

  /** REAL feature lanes for a WAV payload (genuine LPCM sample decode —
    * [[graft.functions.WavPcmKernel.statsWithFmt]], amplitude stats and
    * fmt fields from ONE chunk walk): [n_samples, mean_amp, mean_abs,
    * min_amp, max_amp, peak_to_peak, sample_rate, channels]. null when
    * the kernel rejects the payload.
    */
  private def wavFeatures(bytes: Array[Byte]): Array[Float] = {
    val st = graft.functions.WavPcmKernel.statsWithFmt(bytes)
    if (st == null) return null
    val n = st.getLong(0)
    val (mean, meanAbs) =
      if (n == 0L) (0.0, 0.0)
      else (st.getLong(1).toDouble / n, st.getLong(2).toDouble / n)
    val mn = st.getInt(3)
    val mx = st.getInt(4)
    Array(n.toFloat, mean.toFloat, meanAbs.toFloat, mn.toFloat, mx.toFloat,
      (mx - mn).toFloat, st.getLong(5).toFloat, st.getInt(6).toFloat)
  }

  /** Feature lanes for an animated GIF payload (strict block walk —
    * [[graft.functions.GifKernel.frames]], frame catalog without LZW
    * raster decode): [screen_w, screen_h, n_frames, total_delay_cs,
    * max_frame_w, max_frame_h, sum_frame_area, first_frame_delay_cs].
    * All integer-derived from the container grammar. null when the walk
    * rejects the payload.
    */
  private def gifFeatures(bytes: Array[Byte]): Array[Float] = {
    val st = graft.functions.GifKernel.frames(bytes)
    if (st == null) return null
    val frames = st.getArray(3)
    var totalDelay = 0L; var maxW = 0; var maxH = 0; var area = 0L
    var i = 0
    while (i < frames.numElements()) {
      val f = frames.getStruct(i, 5)
      totalDelay += f.getInt(4)
      if (f.getInt(2) > maxW) maxW = f.getInt(2)
      if (f.getInt(3) > maxH) maxH = f.getInt(3)
      area += f.getInt(2).toLong * f.getInt(3)
      i += 1
    }
    Array(st.getInt(0).toFloat, st.getInt(1).toFloat, st.getInt(2).toFloat,
      totalDelay.toFloat, maxW.toFloat, maxH.toFloat, area.toFloat,
      frames.getStruct(0, 5).getInt(4).toFloat)
  }

  /** Feature lanes for an ISO-BMFF (MP4) payload (strict box walk —
    * [[graft.functions.Mp4Kernel.meta]], sample catalog without codec
    * work): [duration_sec, n_tracks, first_w, first_h, total_samples,
    * total_sample_bytes, mean_sample_delta_sec, max_sample_size]. null
    * when the walk rejects the payload.
    */
  private def mp4Features(bytes: Array[Byte]): Array[Float] = {
    val st = graft.functions.Mp4Kernel.meta(bytes)
    if (st == null) return null
    val tracks = st.getArray(4)
    var totalSamples = 0L; var totalBytes = 0L
    var totalDeltaSec = 0.0 // per-track deltas normalized by THAT track's
    var maxSize = 0         // timescale — video@600 + audio@44100 ticks
    var i = 0               // must never sum in raw units
    while (i < tracks.numElements()) {
      val t = tracks.getStruct(i, 9)
      val samples = t.getArray(8)
      var trackDelta = 0L
      var j = 0
      while (j < samples.numElements()) {
        val sm = samples.getStruct(j, 2)
        totalBytes += sm.getInt(0)
        trackDelta += sm.getInt(1)
        if (sm.getInt(0) > maxSize) maxSize = sm.getInt(0)
        j += 1
      }
      val mts = t.getInt(5)
      if (mts > 0) totalDeltaSec += trackDelta.toDouble / mts
      totalSamples += t.getInt(7)
      i += 1
    }
    val t0 = tracks.getStruct(0, 9)
    Array(
      st.getLong(2).toFloat / math.max(st.getInt(1), 1),
      st.getInt(3).toFloat, t0.getInt(3).toFloat, t0.getInt(4).toFloat,
      totalSamples.toFloat, totalBytes.toFloat,
      if (totalSamples > 0) (totalDeltaSec / totalSamples).toFloat else 0f,
      maxSize.toFloat)
  }

  /** Feature lanes for an APNG payload (CRC-verified frame-control walk
    * — [[graft.functions.ApngKernel.frames]]): [width, height, n_frames,
    * n_plays, total_delay_num, max_frame_w, max_frame_h, sum_frame_area].
    * null when the walk rejects the payload.
    */
  private def apngFeatures(st: org.apache.spark.sql.catalyst.InternalRow): Array[Float] = {
    val frames = st.getArray(4)
    var totalDelay = 0L; var maxW = 0; var maxH = 0; var area = 0L
    var i = 0
    while (i < frames.numElements()) {
      val f = frames.getStruct(i, 8)
      totalDelay += f.getInt(4)
      if (f.getInt(0) > maxW) maxW = f.getInt(0)
      if (f.getInt(1) > maxH) maxH = f.getInt(1)
      area += f.getInt(0).toLong * f.getInt(1)
      i += 1
    }
    Array(st.getInt(0).toFloat, st.getInt(1).toFloat, st.getInt(2).toFloat,
      st.getInt(3).toFloat, totalDelay.toFloat, maxW.toFloat, maxH.toFloat,
      area.toFloat)
  }

  /** Batch feature extraction over the media column. `mapPartitions` is the
    * deliberate choice: one iterator per partition = one decoder
    * instantiation per task, not per row. Content-sniffed magic dispatches
    * each payload to its GENUINE decoder — PNG ([[pngFeatures]], hand-
    * rolled zlib + defilter; an animated APNG member routes to the
    * frame-catalog lane, [[apngFeatures]]), JPEG ([[jpegFeatures]], JDK
    * codec), WAV ([[wavFeatures]], LPCM sample decode), animated GIF
    * ([[gifFeatures]], strict container walk) — and only payloads no real
    * decoder claims (unknown magic, or corrupt within a claimed format)
    * fall to the labeled [[decodeStub]], reported as `decoded = "stub"`.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // production: initialize stateful/native decoders ONCE here, per partition
      rows.map { r =>
        val payload = if (r.bytes == null) Array.empty[Byte] else r.bytes
        // sniffing uses the DECODERS' own magic predicates — one
        // definition per format, so routing can't drift from kernel scope
        val (decoded, feats) = {
          val sniffed =
            if (graft.functions.PngPixelKernel.isPng(payload)) {
              // PNG magic family: an animated member (valid acTL/fcTL
              // chunk stream) takes the frame-catalog lane; otherwise
              // the still-image pixel decoder
              val anim = graft.functions.ApngKernel.frames(payload)
              if (anim != null) ("apng", apngFeatures(anim))
              else ("png", pngFeatures(payload))
            }
            else if (graft.functions.JpegPixelKernel.isJpeg(payload))
              ("jpeg", jpegFeatures(payload))
            else if (graft.functions.WavPcmKernel.isWav(payload))
              ("wav", wavFeatures(payload))
            else if (graft.functions.GifKernel.isGif(payload))
              ("gif", gifFeatures(payload))
            else if (graft.functions.Mp4Kernel.isMp4(payload))
              ("mp4", mp4Features(payload))
            else (null, null)
          if (sniffed._2 != null) sniffed
          else ("stub", decodeStub(payload)) // unknown magic or corrupt payload
        }
        MediaFeatures(r.media_id, r.meta.format, decoded, feats)
      }
    }
  }

  /** Frame sampling shape for video payloads: every `stride`-th fixed-size
    * window of the payload becomes a "frame" record (1→N generator). With a
    * real codec the windowing is time-based; the plan shape (generator +
    * per-partition batch decode) is identical.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.select(col("media_id"), col("meta"),
      posexplode(transform(
        TextOps.indices1(expr(s"cast(meta.nBytes as int) div ($frameBytes * $stride)")),
        i => col("bytes").substr((i - 1) * (frameBytes * stride) + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"),
        length(col("frame_bytes")).cast("long").as("frame_size"))

  /** Fixture-side real multi-frame GIF89a encoder
    * ([[graft.functions.GifKernel.encodeAnim]]).
    */
  def gifAnimBytes(w: Column, h: Column, nFrames: Column,
                   seed: Column): Column =
    graft.functions.ArrayMath.gifAnimBytes(w, h, nFrames, seed)

  /** REAL container frame sampling — the animated-GIF upgrade of
    * [[sampleFrames]]'s byte windows: one strict block walk per payload
    * (native [[graft.functions.GifMeta]] expression over the public
    * GIF89a grammar, no LZW raster decode — frame CATALOGS are a
    * metadata plane) then one generator explode per frame. Zero
    * shuffles, zero UDFs; malformed payloads contribute no rows (a NULL
    * meta struct never explodes).
    *
    * media(media_id, bytes) → (media_id, width, height, n_frames,
    * frame_idx, x_off, y_off, w, h, delay_cs).
    */
  def gifFrames(media: DataFrame): DataFrame =
    media.select(col("media_id"),
        graft.functions.ArrayMath.gifMeta(col("bytes")).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col("media_id"), col("__g.width").as("width"),
        col("__g.height").as("height"), col("__g.n_frames").as("n_frames"),
        posexplode(col("__g.frames")))
      .select(col("media_id"), col("width"), col("height"), col("n_frames"),
        col("pos").as("frame_idx"), col("col.x_off").as("x_off"),
        col("col.y_off").as("y_off"), col("col.w").as("w"),
        col("col.h").as("h"), col("col.delay_cs").as("delay_cs"))

  /** Fixture-side APNG encoder ([[graft.functions.ApngKernel.encodeAnim]]). */
  def apngAnimBytes(w: Column, h: Column, nFrames: Column,
                    seed: Column): Column =
    graft.functions.ArrayMath.apngAnimBytes(w, h, nFrames, seed)

  /** [[gifFrames]]' APNG sibling: per-frame catalog off the CRC-verified
    * PNG chunk walk (native [[graft.functions.ApngMeta]] expression, no
    * payload inflate). media(media_id, bytes) → (media_id, width,
    * height, n_frames, n_plays, frame_idx, w, h, x_off, y_off,
    * delay_num, delay_den, dispose, blend); malformed payloads
    * contribute no rows.
    */
  def apngFrames(media: DataFrame): DataFrame =
    media.select(col("media_id"),
        graft.functions.ArrayMath.apngMeta(col("bytes")).as("__a"))
      .filter(col("__a").isNotNull)
      .select(col("media_id"), col("__a.width").as("width"),
        col("__a.height").as("height"), col("__a.n_frames").as("n_frames"),
        col("__a.n_plays").as("n_plays"), posexplode(col("__a.frames")))
      .select(col("media_id"), col("width"), col("height"), col("n_frames"),
        col("n_plays"), col("pos").as("frame_idx"), col("col.w").as("w"),
        col("col.h").as("h"), col("col.x_off").as("x_off"),
        col("col.y_off").as("y_off"), col("col.delay_num").as("delay_num"),
        col("col.delay_den").as("delay_den"), col("col.dispose").as("dispose"),
        col("col.blend").as("blend"))

  /** UNIFORM-TIME frame selection over an [[mp4Samples]] catalog — the
    * frame-sampling policy vision-training pipelines run ("one frame
    * every N time units"), computed purely on the metadata plane (no
    * codec work): presentation start `pts` is the per-track running sum
    * of sample deltas (one window shuffle on (media_id, track_id) — the
    * minimum, since pts is defined by intra-track order), and sample i
    * is selected iff some multiple of `intervalTicks` falls inside its
    * display span [pts, pts + delta) — integer-exact
    * (`(I − pts mod I) mod I < delta`), so an oracle replays the policy.
    * Sample 0 is always selected (the k = 0 tick).
    *
    * → catalog rows filtered to the selected frames, + `pts`.
    */
  def mp4FrameSample(samples: DataFrame, intervalTicks: Long): DataFrame = {
    require(intervalTicks >= 1, s"intervalTicks must be >= 1: $intervalTicks")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id", "track_id").orderBy("sample_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val i = lit(intervalTicks)
    samples
      .withColumn("pts",
        coalesce(sum(col("sample_delta").cast("long")).over(w), lit(0L)))
      .filter(pmod(i - pmod(col("pts"), i), i) < col("sample_delta"))
  }

  /** Fixture-side real MP4 encoder ([[graft.functions.Mp4Kernel.encodeMp4]]). */
  def mp4Bytes(w: Column, h: Column, nSamples: Column,
               seed: Column): Column =
    graft.functions.ArrayMath.mp4Bytes(w, h, nSamples, seed)

  /** Per-image 64-bit perceptual difference hash over GENUINELY decoded
    * pixels ([[graft.functions.DHashKernel]] — content-sniffed PNG or
    * JPEG lane, integer-exact 9×8 luma grid): media(media_id, bytes) →
    * (media_id, dhash); payloads no real decoder claims get a NULL
    * dhash (kept, so callers can count the undecodable).
    */
  def imageDHash(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.ArrayMath.imageDHash64(col("bytes")).as("dhash"))

  /** Image near-dup pairs: Hamming(dHash) ≤ maxDistance via the SAME
    * 16-bit-chunk banding plan text SimHash uses
    * ([[Dedup.hamming64Pairs]] — complete for distance ≤ 3, shuffles
    * signatures only, never image payloads). The LAION-style image
    * dedup step at corpus scale.
    */
  def imageNearDupPairs(media: DataFrame, maxDistance: Int = 3): DataFrame =
    Dedup.hamming64Pairs(imageDHash(media), "media_id", "dhash", maxDistance)

  /** Image near-dup degree per image — [[Dedup.hamming64Degrees]]' clique-
    * collapsed plan over the dHash signature: identical hashes (exact
    * re-uploads, the dominant duplicate mode in web image corpora) are
    * counted in closed form and only DISTINCT signatures ever band-join,
    * so cost tracks signature diversity, not corpus size.
    */
  def imageNearDupDegrees(media: DataFrame, maxDistance: Int = 3): DataFrame =
    Dedup.hamming64Degrees(imageDHash(media), "media_id", "dhash", maxDistance)

  /** Per-clip 64-bit audio fingerprint over genuinely decoded PCM
    * samples ([[graft.functions.WavPcmKernel.fingerprint64]] —
    * integer-exact 64-window energy-difference hash): media(media_id,
    * bytes) → (media_id, afp); undecodable payloads get a NULL afp.
    */
  def audioFingerprint(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.ArrayMath.audioFingerprint64(col("bytes")).as("afp"))

  /** Audio near-dup pairs/degrees over the fingerprint — the same
    * signature-banding machinery as text SimHash and image dHash
    * ([[Dedup.hamming64Pairs]]/[[Dedup.hamming64Degrees]]).
    */
  def audioNearDupPairs(media: DataFrame, maxDistance: Int = 3): DataFrame =
    Dedup.hamming64Pairs(audioFingerprint(media), "media_id", "afp", maxDistance)

  /** See [[audioNearDupPairs]]; clique-collapsed degree spelling. */
  def audioNearDupDegrees(media: DataFrame, maxDistance: Int = 3): DataFrame =
    Dedup.hamming64Degrees(audioFingerprint(media), "media_id", "afp", maxDistance)

  /** Cross-modal media near-dup verdicts — the corpus-level composition
    * of the image-dHash and audio-fingerprint planes: two assets are
    * media near-dups when EITHER signature sits within its Hamming
    * budget (re-encoded video keeps its soundtrack; re-scored video
    * keeps its frames — a single-modality gate misses both directions).
    * Per asset: near-dup degree per modality, DISTINCT-neighbor degree
    * under the union relation, and the greedy min-id survivor verdict
    * ([[Dedup]]'s dropNearDuplicates rule: an asset is dropped iff some
    * neighbor has a smaller id).
    *
    * Scale shape — asset-level pairs are NEVER materialized: re-uploads
    * make signatures repeat, so the pair relation is quadratic in
    * clique size (a corpus where one asset is re-posted 10^4 times
    * yields 10^8 pairs from that clique alone). Instead the corpus
    * collapses to DISTINCT (image_sig, audio_sig) PROFILES with
    * multiplicity and min member id; only distinct profiles band-join
    * (per modality, the [[Dedup.hamming64Pairs]] plan), and each
    * asset's answers come from profile-level aggregates in closed form:
    * union degree = (own profile's mult − 1, when any signature is
    * non-NULL) + Σ mult over near profiles; dropped iff a smaller id
    * exists in the own profile or any near profile (profile min ids —
    * the pid IS the profile minimum). Per-modality degrees are the
    * already-clique-collapsed [[imageNearDupDegrees]] /
    * [[audioNearDupDegrees]]. Cost tracks signature DIVERSITY, not
    * corpus size; payloads never shuffle (hashes are computed in the
    * projection off the scan).
    *
    * Assets whose payload a modality cannot decode carry a NULL
    * signature there and are near only via the other modality; both
    * NULL → isolated (profiles join null-safely, banding skips NULLs).
    *
    * @param media (media_id, img_bytes, audio_bytes)
    * @return (media_id, n_img, n_audio, n_media, kept) — one row per
    *         asset; degrees 0 and kept=true for isolated assets
    */
  def mediaNearDupVerdicts(media: DataFrame, imgMaxDist: Int = 2,
                           audioMaxDist: Int = 2): DataFrame = {
    val sigs = media.select(col("media_id"),
      graft.functions.ArrayMath.imageDHash64(col("img_bytes")).as("isig"),
      graft.functions.ArrayMath.audioFingerprint64(col("audio_bytes"))
        .as("asig"))
    val prof = sigs.groupBy("isig", "asig")
      .agg(count(lit(1)).as("__mult"), min("media_id").as("__pid"))
    // profile-granular near relation: one banding plan per modality over
    // the DISTINCT signatures; pid (the profile's min member id) keys it
    val ipairs = Dedup.hamming64Pairs(
      prof.select(col("__pid"), col("isig")), "__pid", "isig", imgMaxDist)
      .select(col("id_a"), col("id_b"))
    val apairs = Dedup.hamming64Pairs(
      prof.select(col("__pid"), col("asig")), "__pid", "asig", audioMaxDist)
      .select(col("id_a"), col("id_b"))
    val u = ipairs.union(apairs).distinct()
    val sym = u.union(u.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    // per profile: total member mass of near profiles + their min id
    val neigh = sym
      .join(prof.select(col("__pid").as("id_b"), col("__mult").as("__bm")),
        Seq("id_b"))
      .groupBy(col("id_a").as("__pid"))
      .agg(sum("__bm").as("__nmass"), min("id_b").as("__min_near"))
    val profStats = prof
      .join(neigh, Seq("__pid"), "left")
      .select(col("isig").as("__pi"), col("asig").as("__pa"),
        col("__pid"), col("__mult"), col("__nmass"), col("__min_near"))
    val withProf = sigs.join(profStats,
      col("isig") <=> col("__pi") && col("asig") <=> col("__pa"))
    // within-profile members are distance-0 neighbors via any non-NULL
    // signature; both-NULL profiles are mutually UNrelated
    val selfNear = col("isig").isNotNull || col("asig").isNotNull
    val base = withProf.select(col("media_id"),
      (when(selfNear, col("__mult") - 1).otherwise(lit(0L)) +
        coalesce(col("__nmass"), lit(0L))).as("n_media"),
      ((selfNear && col("media_id") > col("__pid")) ||
        coalesce(col("__min_near") < col("media_id"), lit(false)))
        .as("__dropped"))
    base
      .join(imageNearDupDegrees(
          media.select(col("media_id"), col("img_bytes").as("bytes")),
          imgMaxDist).withColumnRenamed("n_near_dups", "n_img"),
        Seq("media_id"), "left")
      .join(audioNearDupDegrees(
          media.select(col("media_id"), col("audio_bytes").as("bytes")),
          audioMaxDist).withColumnRenamed("n_near_dups", "n_audio"),
        Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_img"), lit(0L)).as("n_img"),
        coalesce(col("n_audio"), lit(0L)).as("n_audio"),
        col("n_media"), (!col("__dropped")).as("kept"))
  }

  /** VIDEO sample catalog — [[gifFrames]]' ISO-BMFF sibling: one strict
    * box walk per payload (native [[graft.functions.Mp4Meta]] expression
    * over the public ISO/IEC 14496-12 grammar — no codec work, `mdat` is
    * never read) then two generator explodes: per track, then per
    * sample. Zero shuffles, zero UDFs; malformed payloads contribute no
    * rows (a NULL meta struct never explodes).
    *
    * media(media_id, bytes) → (media_id, major_brand, timescale,
    * duration, n_tracks, track_id, handler, codec, width, height,
    * media_timescale, media_duration, n_samples, sample_idx,
    * sample_size, sample_delta).
    */
  def mp4Samples(media: DataFrame): DataFrame =
    media.select(col("media_id"),
        graft.functions.ArrayMath.mp4Meta(col("bytes")).as("__m"))
      .filter(col("__m").isNotNull)
      .select(col("media_id"), col("__m.major_brand").as("major_brand"),
        col("__m.timescale").as("timescale"),
        col("__m.duration").as("duration"),
        col("__m.n_tracks").as("n_tracks"), explode(col("__m.tracks")))
      .select(col("media_id"), col("major_brand"), col("timescale"),
        col("duration"), col("n_tracks"),
        col("col.track_id").as("track_id"),
        col("col.handler").as("handler"), col("col.codec").as("codec"),
        col("col.width").as("width"), col("col.height").as("height"),
        col("col.media_timescale").as("media_timescale"),
        col("col.media_duration").as("media_duration"),
        col("col.n_samples").as("n_samples"), posexplode(col("col.samples")))
      .select(col("media_id"), col("major_brand"), col("timescale"),
        col("duration"), col("n_tracks"), col("track_id"), col("handler"),
        col("codec"), col("width"), col("height"), col("media_timescale"),
        col("media_duration"), col("n_samples"),
        col("pos").as("sample_idx"), col("col.size").as("sample_size"),
        col("col.delta").as("sample_delta"))
}
