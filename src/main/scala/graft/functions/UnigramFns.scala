package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi encode of a whitespace-split word array against a trained
  * unigram-LM vocabulary ([[graft.ops.Unigram]], Kudo ACL'18): per word,
  * the segmentation into vocabulary pieces maximizing the summed piece
  * log-probability. This is the corpus-scale hot path, so the vocabulary
  * rides as ONE reference object (each entry "piece scaledScore" with the
  * score an EXACT DECIMAL(18,12) log-prob scaled to a long by 10^12) and
  * generated code makes a single call back into [[encodeWords]] inside
  * the whole-stage span — the [[BpeEncode]] pattern.
  *
  * Determinism = the trainer's exact arithmetic carried through: scores
  * add as longs (≤ 64 pieces × |ln p| < 2^62 — no float accumulation),
  * and ties break by the LEXICOGRAPHICALLY SMALLEST full piece path —
  * byte-for-byte the `ORDER BY score DESC, path` rule of the trainer's
  * DataFrame Viterbi, so encode(word) == the trainer's own segmentation
  * of that word (spec-asserted).
  *
  * A code point absent from the vocabulary falls back to a floor-scored
  * single-character piece (min vocab score − 10.0): every word encodes,
  * unknown characters surface as their own tokens (the byte-fallback
  * convention), and the floor is deterministic from the vocabulary alone.
  */
case class UnigramEncode(child: Expression, pieces: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    require(pieces.nonEmpty, "unigram_encode: empty vocabulary")
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      // pieces never contain spaces (words are whitespace-split), so the
      // LAST space separates piece from score — same parsing the BPE
      // merge list uses from the other end
      val sep = pieces(i).lastIndexOf(' ')
      val p = pieces(i).substring(0, sep)
      val s = java.lang.Long.parseLong(pieces(i).substring(sep + 1))
      if (!m.containsKey(p)) m.put(p, s)
      i += 1
    }
    m
  }

  @transient private lazy val floorScore: Long = {
    var min = java.lang.Long.MAX_VALUE
    scores.forEach((_, v) => if (v < min) min = v)
    min - 10000000000000L // minus 10.0 at the 10^12 scale
  }

  @transient private lazy val maxPieceCp: Int = {
    var m = 1
    scores.forEach((k, _) => {
      val n = k.codePointCount(0, k.length)
      if (n > m) m = n
    })
    m
  }

  private def codePoints(w: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out
  }

  private def encodeWord(w: String, out: ArrayBuffer[UTF8String]): Unit = {
    val cps = codePoints(w)
    val n = cps.length
    val best = new Array[Long](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var p = 1
    while (p <= n) {
      var bestScore = java.lang.Long.MIN_VALUE
      var bestPath: String = null
      var s = math.max(0, p - maxPieceCp)
      while (s < p) {
        if (path(s) != null) {
          val piece = cps.slice(s, p).mkString
          val sc = scores.get(piece)
          val pieceScore: java.lang.Long =
            if (sc != null) sc
            else if (p - s == 1) java.lang.Long.valueOf(floorScore)
            else null
          if (pieceScore != null) {
            val cand = best(s) + pieceScore.longValue()
            val candPath =
              if (path(s).isEmpty) piece else path(s) + " " + piece
            if (cand > bestScore ||
                (cand == bestScore && candPath.compareTo(bestPath) < 0)) {
              bestScore = cand
              bestPath = candPath
            }
          }
        }
        s += 1
      }
      best(p) = bestScore
      path(p) = bestPath // single-char fallback keeps every pos reachable
      p += 1
    }
    var i = 0
    val toks = path(n).split(' ')
    while (i < toks.length) {
      out += UTF8String.fromString(toks(i))
      i += 1
    }
  }

  /** Public for generated code. */
  def encodeWords(words: ArrayData): ArrayData = {
    val out = new ArrayBuffer[UTF8String]()
    var i = 0
    while (i < words.numElements()) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) encodeWord(w, out)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(v: Any): Any =
    encodeWords(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpr", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encodeWords($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}
