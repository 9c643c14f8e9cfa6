package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL JPEG pixel decode via the JDK's OWN codec (`javax.imageio` ships
  * with every Java runtime — no external library): Huffman + IDCT run in
  * the platform decoder, and this kernel reduces the decoded raster to
  * per-channel means — completing genuine pixel-level decode for the
  * second image format next to the hand-rolled [[PngPixelKernel]].
  * JPEG is LOSSY, so (unlike PNG) means are verified against a tolerance
  * band, not bit-for-bit: the q32/q110 oracle pattern becomes dims-exact
  * + in-band verdict booleans.
  *
  * NULL for payloads ImageIO cannot decode and for rasters above the
  * decompression-bomb guard (64 MP).
  */
object JpegPixelKernel {

  /** Max decoded pixels: 64 MP (the [[PngPixelKernel.MaxRawBytes]]
    * analogue for a codec whose raster size we learn from the header).
    */
  val MaxPixels: Long = 1L << 26

  /** JPEG SOI magic — shared with [[graft.ops.Multimodal.extractFeatures]]
    * sniffing (one definition, so sniffing can't drift from decoder scope).
    */
  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  def decode(b: Array[Byte]): InternalRow = {
    val img = readImage(b)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w.toLong * h > MaxPixels) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    new GenericInternalRow(Array[Any](w, h, sr / n, sg / n, sb / n))
  }

  /** Guarded ImageIO read shared by [[decode]] and the perceptual-hash
    * lane ([[DHashKernel]]): null outside scope, never a throw.
    */
  private[functions] def readImage(b: Array[Byte]): java.awt.image.BufferedImage = {
    if (b == null || !isJpeg(b)) return null
    // the bomb guard must run BEFORE the raster allocates: a few-KB
    // payload can declare a multi-GB raster, and the resulting
    // OutOfMemoryError is an Error no handler below would catch. Image
    // readers expose header dims without decoding.
    val img =
      try {
        // iis is created before any early exit and closed in its own
        // finally: the no-reader path used to return with it open, and
        // with ImageIO's default disk cache every such payload leaked a
        // temp file + file descriptor on executors at corpus scale
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val hw = reader.getWidth(0).toLong
              val hh = reader.getHeight(0).toLong
              if (hw <= 0 || hh <= 0 || hw * hh > MaxPixels) null
              else reader.read(0)
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => null }
    img
  }

  /** Fixture-side REAL JPEG encoder (ImageIO write path — genuine DCT
    * quantization, default quality): the same (c0 + x + y) mod 256
    * gradient as [[PngEncodeKernel]], so decoded channel means must land
    * within a lossy-compression band of the closed form the oracle
    * computes.
    */
  def encodeGradient(w: Int, h: Int, r0: Int, g0: Int, b0: Int): Array[Byte] = {
    require(w >= 1 && w <= 4096 && h >= 1 && h <= 4096,
      s"jpeg fixture dims out of [1, 4096]: ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (r0 + x + y) & 0xff
        val g = (g0 + x + y) & 0xff
        val b = (b0 + x + y) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "jpg", out)
    require(ok, "JDK ImageIO has no jpg writer (never on a hotspot JVM)")
    out.toByteArray
  }
}

/** binary → struct<width,height,mean_r,mean_g,mean_b> from a genuinely
  * decoded JPEG (JDK codec); NULL when undecodable. Same static-kernel
  * codegen shape as [[PngPixelStats]].
  */
case class JpegPixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    JpegPixelKernel.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.JpegPixelKernel.decode($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "jpeg_pixel_stats"
}

/** (w, h, r0, g0, b0) → real JPEG bytes ([[JpegPixelKernel
  * .encodeGradient]]); fixture side, eval-mode CodegenFallback.
  */
case class JpegGradientBytes(children: Seq[Expression])
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
      JpegPixelKernel.encodeGradient(w, h, r0, g0, b0)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "jpeg_gradient_bytes"
}
