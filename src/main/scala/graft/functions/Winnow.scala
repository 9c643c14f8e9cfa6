package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing fingerprint selection (Schleimer, Wilkerson &
  * Aiken, SIGMOD 2003 — the MOSS algorithm): k-gram md5-h48 hashes,
  * per-window-of-w rightmost minimum, deduplicated selected positions —
  * the ENTIRE per-document computation in one codegen kernel call
  * (winnowing is per-document by definition: windows never cross
  * documents, so the exploded (id, pos, hash) plane plus the
  * id-partitioned window pass it replaces was pure shuffle overhead).
  *
  * Exactness contract, so the SQL oracle and the exploded spelling
  * replay bit-for-bit:
  *   - positions address CODE POINTS 1-based (SQL `substring`);
  *   - the hash is the first 12 hex chars of md5(UTF-8 bytes of the
  *     k-gram) as an unsigned 48-bit integer — exactly
  *     `conv(substring(md5(g), 1, 12), 16, 10)` (the Sketches h48
  *     recipe);
  *   - per window of w consecutive k-gram positions, the selected
  *     fingerprint minimizes (hash asc, position desc) — the rightmost
  *     minimum, via a monotone deque (O(n) total);
  *   - only FULL windows select (documents with fewer than w k-grams
  *     emit nothing); selected positions deduplicate.
  *
  * NULL text → NULL (the caller's explode skips it, matching the old
  * plane's zero rows).
  */
object WinnowKernel {

  /** (fp_pos 1-based, fp_hash) per selected position, position order. */
  def fingerprints(t: UTF8String, k: Int, w: Int): ArrayData = {
    if (t == null) return null
    val b = t.getBytes
    val off = ChrfKernel.codePointOffsets(b)
    val n = off.length - 1 - k + 1 // k-gram count
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val h = new Array[Long](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      md.update(b, off(i), off(i + k) - off(i))
      val d = md.digest()
      h(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    // monotone deque of positions, strictly increasing hash; an equal
    // hash arriving later evicts the earlier one, so the head is always
    // the window's RIGHTMOST minimum
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val sel = new Array[Boolean](n)
    var nSel = 0
    i = 0
    while (i < n) {
      while (tail > head && h(i) <= h(dq(tail - 1))) tail -= 1
      dq(tail) = i
      tail += 1
      while (dq(head) <= i - w) head += 1
      if (i >= w - 1 && !sel(dq(head))) { sel(dq(head)) = true; nSel += 1 }
      i += 1
    }
    val out = new Array[Any](nSel)
    var p = 0
    var o = 0
    while (p < n) {
      if (sel(p)) {
        out(o) = new GenericInternalRow(Array[Any]((p + 1).toLong, h(p)))
        o += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** string → array<struct<fp_pos:bigint, fp_hash:bigint>> via
  * [[WinnowKernel.fingerprints]]. Corpus-scale: codegen'd static-kernel
  * call, zero shuffles.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 64, s"k must be in [2,64], got $k")
  require(w >= 2 && w <= 64, s"w must be in [2,64], got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case a => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${a.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp_pos", LongType, nullable = false),
      StructField("fp_hash", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    WinnowKernel.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowKernel.fingerprints($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}
