package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PngEncodeKernel, PngPixelKernel}
import graft.ops.Multimodal

/** The PNG pixel decoder is certified against the JDK's INDEPENDENT
  * ImageIO decoder (javax.imageio ships with Java) — our inflate +
  * defilter + statistics must agree with a mainstream decoder on the
  * same real bytes, and corrupt bytes must yield NULL, not garbage.
  */
class PngPixelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def imageIoMeans(png: Array[Byte]): (Int, Int, Double, Double, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not read the fixture PNG")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    val n = (img.getWidth * img.getHeight).toDouble
    (img.getWidth, img.getHeight, sr / n, sg / n, sb / n)
  }

  test("decoder agrees with ImageIO on real encoder output, all filter types") {
    // heights >= 5 exercise every scanline filter (encoder cycles y % 5)
    val cases = Seq((1, 1, 0, 128, 255), (3, 5, 10, 20, 30), (8, 7, 250, 3, 99),
      (16, 11, 77, 200, 155), (2, 6, 255, 255, 255))
    cases.foreach { case (w, h, r0, g0, b0) =>
      val png = PngEncodeKernel.encode(w, h, r0, g0, b0)
      val got = PngPixelKernel.decode(png)
      assert(got != null, s"decode failed for ${w}x$h")
      val (iw, ih, ir, ig, ib) = imageIoMeans(png)
      assert(got.getInt(0) == iw && got.getInt(1) == ih && got.getInt(2) == 3)
      assert(math.abs(got.getDouble(3) - ir) < 1e-9, s"mean_r ${got.getDouble(3)} vs ImageIO $ir")
      assert(math.abs(got.getDouble(4) - ig) < 1e-9)
      assert(math.abs(got.getDouble(5) - ib) < 1e-9)
    }
  }

  test("golden in-the-wild 1x1 RGBA PNG decodes to its ImageIO pixel") {
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val got = PngPixelKernel.decode(png)
    assert(got != null)
    val (_, _, ir, ig, ib) = imageIoMeans(png)
    assert(got.getInt(0) == 1 && got.getInt(1) == 1 && got.getInt(2) == 4)
    assert(got.getDouble(3) == ir && got.getDouble(4) == ig && got.getDouble(5) == ib)
  }

  test("corrupt and out-of-scope inputs are NULL, never garbage") {
    val good = PngEncodeKernel.encode(4, 4, 10, 20, 30)
    // flip one IDAT payload byte -> CRC mismatch
    val crcBad = good.clone()
    crcBad(8 + 25 + 12) = (crcBad(8 + 25 + 12) ^ 0x01).toByte
    assert(PngPixelKernel.decode(crcBad) == null, "flipped IDAT byte must fail CRC")
    // truncation mid-IDAT
    assert(PngPixelKernel.decode(good.dropRight(16)) == null)
    // header-only PNG (no IDAT)
    val headerOnly = spark.range(1).select(
      Multimodal.pngHeaderBytes(lit(4), lit(4), lit(3)).as("b"))
      .head().getAs[Array[Byte]](0)
    assert(PngPixelKernel.decode(headerOnly) == null)
    // not a PNG at all
    assert(PngPixelKernel.decode("JFIF not png".getBytes("US-ASCII")) == null)
    assert(PngPixelKernel.decode(Array.empty[Byte]) == null)
    // FDICT zlib header (preset dictionary, CMF/FLG = 0x78 0x20 — valid
    // checksum, bit 5 set): Inflater reports needsDictionary() by
    // returning 0 with needsInput() false — must yield NULL, not an
    // infinite inflate loop (regression: review finding r7)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8 + 25) // signature + IHDR straight from a real PNG
    val payload = Array[Byte](0x78, 0x20, 0, 0, 0, 0)
    out.write(Array[Byte](0, 0, 0, payload.length.toByte), 0, 4)
    val typAndPayload = "IDAT".getBytes("US-ASCII") ++ payload
    out.write(typAndPayload, 0, typAndPayload.length)
    val crc = new java.util.zip.CRC32()
    crc.update(typAndPayload)
    val v = crc.getValue
    out.write(Array[Byte](((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte), 0, 4)
    out.write(Array[Byte](0, 0, 0, 0, 'I', 'E', 'N', 'D'), 0, 8)
    val iendCrc = new java.util.zip.CRC32()
    iendCrc.update("IEND".getBytes("US-ASCII"))
    val vi = iendCrc.getValue
    out.write(Array[Byte](((vi >>> 24) & 0xff).toByte, ((vi >>> 16) & 0xff).toByte,
      ((vi >>> 8) & 0xff).toByte, (vi & 0xff).toByte), 0, 4)
    assert(PngPixelKernel.decode(out.toByteArray) == null, "FDICT stream must be NULL")
  }

  test("over-long IDAT stream is NULL, not truncated to the declared raster") {
    val good = PngEncodeKernel.encode(2, 2, 10, 20, 30)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8 + 25) // signature + IHDR from a real PNG
    // deflate MORE bytes than the declared raster ((2*3+1)*2 = 14): the
    // all-zero prefix is a perfectly valid raster (filter None, black
    // pixels), so a decoder that stops at the declared size would emit
    // stats from the prefix — with every chunk CRC valid
    val overlong = new Array[Byte](14 + 7)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(overlong)
    deflater.finish()
    val buf = new Array[Byte](256)
    val payloadOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      payloadOut.write(buf, 0, n)
    }
    deflater.end()
    def chunk(typ: String, pl: Array[Byte]): Unit = {
      out.write(Array[Byte]((pl.length >>> 24).toByte, (pl.length >>> 16).toByte,
        (pl.length >>> 8).toByte, pl.length.toByte), 0, 4)
      val tp = typ.getBytes("US-ASCII") ++ pl
      out.write(tp, 0, tp.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tp)
      val v = crc.getValue
      out.write(Array[Byte](((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte), 0, 4)
    }
    chunk("IDAT", payloadOut.toByteArray)
    chunk("IEND", Array.empty)
    assert(PngPixelKernel.decode(out.toByteArray) == null,
      "stream inflating past the declared raster must be NULL")
    // the finished-probe does not false-positive on conforming streams
    assert(PngPixelKernel.decode(good) != null)
  }

  test("resize agrees with nearest-neighbor over ImageIO pixels; identity is lossless") {
    val cases = Seq((8, 7, 10, 20, 30, 3, 2), (5, 9, 250, 3, 99, 2, 4),
      (4, 4, 77, 200, 155, 6, 6), (16, 11, 0, 128, 255, 16, 11)) // up + identity
    cases.foreach { case (w, h, r0, g0, b0, ow, oh) =>
      val png = PngEncodeKernel.encode(w, h, r0, g0, b0)
      val got = PngPixelKernel.resize(png, ow, oh)
      assert(got != null, s"resize failed for ${w}x$h -> ${ow}x$oh")
      assert(got.getInt(0) == ow && got.getInt(1) == oh && got.getInt(2) == 3)
      val px = got.getBinary(3)
      assert(px.length == ow * oh * 3)
      // independent reference: ⌊x·w/ow⌋ sampling over ImageIO's decode
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      for (y <- 0 until oh; x <- 0 until ow) {
        val rgb = img.getRGB((x.toLong * w / ow).toInt, (y.toLong * h / oh).toInt)
        val off = (y * ow + x) * 3
        assert((px(off) & 0xff) == ((rgb >> 16) & 0xff) &&
          (px(off + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (px(off + 2) & 0xff) == (rgb & 0xff),
          s"pixel ($x,$y) of ${w}x$h -> ${ow}x$oh mismatches NN reference")
      }
      // identity resize reproduces the decoded buffer byte-for-byte
      if (ow == w && oh == h) {
        val orig = PngPixelKernel.decodeImage(png)
        assert(java.util.Arrays.equals(px, orig.samples))
      }
    }
    // channel stats over the resized buffer match a direct sum
    val png = PngEncodeKernel.encode(9, 6, 1, 2, 3)
    val rs = PngPixelKernel.resize(png, 3, 2)
    val st = PngPixelKernel.channelStats(rs.getBinary(3), 3)
    assert(st.getLong(0) == 6L)
    val expected = (for (y <- 0 until 2; x <- 0 until 3)
      yield (1 + (x * 9) / 3 + (y * 6) / 2) % 256).sum.toLong
    assert(st.getLong(1) == expected)
    // guards: bad dims / bad channel counts / ragged buffers are NULL
    assert(PngPixelKernel.resize(png, 0, 4) == null)
    assert(PngPixelKernel.resize(png, 4, 4097) == null)
    assert(PngPixelKernel.resize("nope".getBytes("US-ASCII"), 4, 4) == null)
    assert(PngPixelKernel.channelStats(new Array[Byte](6), 2) == null)
    assert(PngPixelKernel.channelStats(new Array[Byte](7), 3) == null)
  }

  test("column expression decodes distributed and stays codegen-friendly") {
    import spark.implicits._
    val df = Seq((1L, 3, 5, 0, 100, 200), (2L, 8, 7, 50, 60, 70))
      .toDF("id", "w", "h", "r0", "g0", "b0")
    val out = df.select(col("id"), Multimodal.pngPixelStats(
      Multimodal.pngGradientBytes(col("w"), col("h"), col("r0"), col("g0"),
        col("b0"))).as("m"))
      .orderBy("id").collect()
    // closed-form gradient mean: avg over (x, y) of (c0 + x + y) % 256
    def mean(wd: Int, ht: Int, c0: Int): Double =
      (for (x <- 0 until wd; y <- 0 until ht) yield (c0 + x + y) % 256)
        .sum.toDouble / (wd * ht)
    assert(out(0).getStruct(1).toSeq.take(3) == Seq(3, 5, 3))
    assert(out(0).getStruct(1).getDouble(3) == mean(3, 5, 0))
    assert(out(1).getStruct(1).getDouble(5) == mean(8, 7, 70))
    // the decode expression participates in whole-stage codegen (a
    // non-local source — Seq.toDF folds to LocalTableScan at plan time)
    val plan = spark.range(4).select(Multimodal.pngPixelStats(
      Multimodal.pngGradientBytes(
        (col("id") % 7 + 2).cast("int"), (col("id") % 5 + 2).cast("int"),
        lit(10), lit(20), lit(30))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected a WholeStageCodegen span\n$plan")
  }

  test("pngAHash: hand-computed bit pattern, clone equality, NULL passthrough") {
    import spark.implicits._
    // 8x8 gradient with r0=g0=b0=0: resize is identity, gray3(x,y) =
    // 3(x+y), total = 1344, bit(i = 8y+x) set iff 192(x+y) > 1344,
    // i.e. x+y > 7 -- the lower-right anti-diagonal triangle.
    val expected = (0 until 64).filter(i => (i % 8) + (i / 8) > 7)
      .map(i => 1L << (63 - i)).sum
    val df = Seq((1, 8, 8, 0), (2, 8, 8, 0), (3, 8, 8, 7)).toDF(
      "id", "w", "h", "c0")
    val got = df.select(col("id"), Multimodal.pngAHash(
        Multimodal.pngGradientBytes(col("w"), col("h"), col("c0"),
          col("c0"), col("c0"))).as("ahash"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(1) == expected, s"ahash ${got(1).toBinaryString}")
    // identical parameters -> identical hash; a +7 offset shifts all
    // grays equally (no wrap at these values) -> the SAME hash
    assert(got(2) == got(1) && got(3) == got(1))
    // undecodable payload -> NULL
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
      .select(Multimodal.pngAHash(col("b")).as("h")).head()
    assert(bad.isNullAt(0))
    // composes with the banded hamming machinery: 3 items, all within
    // distance 0 of each other -> degree 2 each
    val deg = graft.ops.Dedup.hamming64Degrees(
      df.select(col("id"), Multimodal.pngAHash(
        Multimodal.pngGradientBytes(col("w"), col("h"), col("c0"),
          col("c0"), col("c0"))).as("ahash")),
      "id", "ahash", maxDistance = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(deg == Map(1 -> 2L, 2 -> 2L, 3 -> 2L), s"degrees: $deg")
  }
}
