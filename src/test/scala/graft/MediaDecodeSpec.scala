package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JpegPixelKernel, WavPcmKernel}
import graft.ops.Multimodal

/** JPEG pixel decode (JDK codec) and WAV PCM sample decode are certified
  * against independent references: ImageIO's own raster for JPEG (the
  * encoder and decoder share it, so the *kernel reduction* is what's
  * under test, plus the lossy band vs the closed form), and
  * `javax.sound.sampled` — a SEPARATE JDK audio stack — for PCM.
  */
class MediaDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("PCM stats agree with javax.sound.sampled on real tone WAVs, 8 and 16 bit") {
    val cases = Seq((1, 8000, 8, 50), (2, 16000, 16, 37), (2, 44100, 8, 1),
      (1, 22050, 16, 100))
    cases.foreach { case (ch, rate, bits, frames) =>
      val wav = WavPcmKernel.encodeTone(ch, rate, bits, frames)
      val got = WavPcmKernel.stats(wav)
      assert(got != null, s"stats failed for ch=$ch bits=$bits frames=$frames")
      // independent decode through the JDK audio stack
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      assert(fmt.getChannels == ch && fmt.getSampleRate.toInt == rate &&
        fmt.getSampleSizeInBits == bits)
      val raw = ais.readAllBytes()
      val n = raw.length / (bits / 8)
      var sum = 0L; var sumAbs = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < n) {
        val amp =
          if (bits == 8) (raw(i) & 0xff) - 128
          else {
            val v = (raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)
            if (v >= 0x8000) v - 0x10000 else v
          }
        sum += amp; sumAbs += math.abs(amp)
        mn = math.min(mn, amp); mx = math.max(mx, amp)
        i += 1
      }
      assert(got.getLong(0) == n.toLong, "sample count")
      assert(got.getLong(1) == sum && got.getLong(2) == sumAbs)
      assert(got.getInt(3) == mn && got.getInt(4) == mx)
      // 16-bit tones cross zero: sign extension must produce negatives
      if (bits == 16) assert(got.getInt(3) < 0 && got.getInt(4) > 0)
    }
  }

  test("PCM decode guards: corrupt, float-PCM, ragged and header-only are NULL") {
    val good = WavPcmKernel.encodeTone(2, 16000, 16, 10)
    assert(WavPcmKernel.stats(good.dropRight(3)) == null, "truncated chunk")
    assert(WavPcmKernel.stats("RIFFnope".getBytes("US-ASCII")) == null)
    // format code 3 (IEEE float) is header-parseable but not sample-decodable
    val floatWav = good.clone(); floatWav(20) = 3
    assert(WavPcmKernel.stats(floatWav) == null)
    // zero frames is in scope: all-zero statistics, not NULL
    val empty = WavPcmKernel.stats(WavPcmKernel.encodeTone(1, 8000, 8, 0))
    assert(empty != null && empty.getLong(0) == 0L && empty.getInt(3) == 0)
  }

  test("JPEG decode: dims exact, means within the lossy band, corrupt NULL") {
    val cases = Seq((8, 8, 10, 90, 160), (16, 9, 0, 50, 199), (9, 14, 120, 5, 60))
    cases.foreach { case (w, h, r0, g0, b0) =>
      val jpg = JpegPixelKernel.encodeGradient(w, h, r0, g0, b0)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "real JPEG magic")
      val got = JpegPixelKernel.decode(jpg)
      assert(got != null)
      assert(got.getInt(0) == w && got.getInt(1) == h)
      def closed(c0: Int) = c0 + (w - 1) / 2.0 + (h - 1) / 2.0
      assert(math.abs(got.getDouble(2) - closed(r0)) <= 4.0,
        s"mean_r ${got.getDouble(2)} vs ${closed(r0)}")
      assert(math.abs(got.getDouble(3) - closed(g0)) <= 4.0)
      assert(math.abs(got.getDouble(4) - closed(b0)) <= 4.0)
    }
    // PNG bytes are not JPEG; truncated JPEG is NULL not garbage
    val png = graft.functions.PngEncodeKernel.encode(4, 4, 1, 2, 3)
    assert(JpegPixelKernel.decode(png) == null)
    val jpg = JpegPixelKernel.encodeGradient(8, 8, 10, 20, 30)
    assert(JpegPixelKernel.decode(jpg.take(20)) == null)
  }

  test("column expressions decode distributed over generated media") {
    import spark.implicits._
    val df = Seq((1L, 1, 8, 10), (2L, 2, 16, 25)).toDF("id", "ch", "bits", "frames")
    val out = df.select(col("id"), Multimodal.audioPcmStats(
      Multimodal.wavToneBytes(col("ch"), lit(8000), col("bits"), col("frames")))
      .as("s")).orderBy("id").collect()
    assert(out(0).getStruct(1).getLong(0) == 10L) // 1ch x 10 frames
    assert(out(1).getStruct(1).getLong(0) == 50L) // 2ch x 25 frames
    val jj = Seq((1L, 8, 8, 10, 20, 30)).toDF("id", "w", "h", "r0", "g0", "b0")
      .select(Multimodal.jpegPixelStats(Multimodal.jpegGradientBytes(
        col("w"), col("h"), col("r0"), col("g0"), col("b0"))).as("m"))
      .head().getStruct(0)
    assert(jj.getInt(0) == 8 && jj.getInt(1) == 8)
  }

  test("mediaNearDupVerdicts: cross-modal union, NULL-sig isolation, min-id survivor") {
    import spark.implicits._
    // img A: assets 1,2,3 · undecodable img: 4,5,6,7 (every decodable
    // gradient fixture dHashes identically — monotone luma — so image
    // DIVERSITY comes from decodability here)
    // audio X: assets 1,2,4,5 · audio Y: asset 3 · undecodable audio: 6,7
    val imgA = Multimodal.pngGradientBytes(lit(16), lit(16), lit(10), lit(20), lit(30))
    val audX = Multimodal.wavToneBytes(lit(1), lit(8000), lit(16), lit(100))
    val audY = Multimodal.wavToneBytes(lit(2), lit(8000), lit(16), lit(77))
    val junk = lit(Array[Byte](1, 2, 3))
    val media = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("media_id").select(
      col("media_id"),
      when(col("media_id") <= 3, imgA).otherwise(junk).as("img_bytes"),
      when(col("media_id").isin(1, 2, 4, 5), audX)
        .when(col("media_id") === 3, audY).otherwise(junk).as("audio_bytes"))
    val got = Multimodal.mediaNearDupVerdicts(media, 0, 0)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      // (id, n_img, n_audio, n_media, kept)
      (1L, 2L, 3L, 4L, true),  // near 2,3 (img) ∪ 2,4,5 (audio)
      (2L, 2L, 3L, 4L, false), // same neighborhood, 1 < 2 drops it
      (3L, 2L, 0L, 2L, false), // image-only near-dup of 1,2
      (4L, 0L, 3L, 3L, false), // audio-only near-dup of 1,2,5
      (5L, 0L, 3L, 3L, false), // NULL image: related via audio alone
      (6L, 0L, 0L, 0L, true),  // both NULL: isolated …
      (7L, 0L, 0L, 0L, true)), // … even from the other both-NULL asset
      s"got: ${got.toSeq}")
  }
}
