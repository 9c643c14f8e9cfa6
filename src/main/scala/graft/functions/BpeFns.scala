package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE kernels for [[graft.ops.Bpe]]. */

/** Fuse every non-overlapping left-to-right occurrence of the adjacent
  * symbol pair (l, r) in a symbol array — ONE training round's rewrite.
  * Runs on the VOCAB table (|word types| rows, not corpus rows), so
  * eval-mode CodegenFallback costs nothing measurable, same reasoning as
  * [[TopCentroidIds]].
  */
case class BpeMergePair(first: Expression, second: Expression,
                        third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(symsAny: Any, lAny: Any, rAny: Any): Any = {
    val syms = symsAny.asInstanceOf[ArrayData]
    val l = lAny.asInstanceOf[UTF8String]
    val r = rAny.asInstanceOf[UTF8String]
    val n = syms.numElements()
    val out = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms.getUTF8String(i) == l &&
          syms.getUTF8String(i + 1) == r) {
        out += UTF8String.concat(l, r)
        i += 2
      } else {
        out += syms.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "bpe_merge_pair"
}

/** Greedy BPE encode of a whitespace-split word array against a learned
  * merge list: per word, repeatedly fuse the LOWEST-RANK adjacent pair
  * (all non-overlapping occurrences, left to right — exactly the training
  * rewrite) until no learned pair remains, then emit the concatenation of
  * all words' subword tokens. This is the corpus-scale hot path, so the
  * merge ranks ride as ONE reference object (a hash map built lazily per
  * executor) and generated code makes a single call back into
  * [[encodeWords]] inside the whole-stage span — the
  * [[BloomMightContain]] pattern. Symbols are Unicode code points,
  * matching `split(w, '')` in training.
  */
case class BpeEncode(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // two-level (left -> right -> rank) map: the encode hot loop probes every
  // adjacent symbol pair on every merge iteration, so a flat "l r"-keyed map
  // would allocate a fresh concatenated key per probe (O(L^2) short-lived
  // strings per word); nested lookup is allocation-free. Symbols never
  // contain spaces (training reserves the space as separator), so the first
  // space in a merge entry is always the left/right boundary.
  @transient private lazy val ranks:
      java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]](
      merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val sep = merges(i).indexOf(' ')
      val l = merges(i).substring(0, sep)
      val r = merges(i).substring(sep + 1)
      val inner = m.computeIfAbsent(l,
        _ => new java.util.HashMap[String, Integer]())
      // first-learned rank wins if a pair somehow repeats
      if (!inner.containsKey(r)) inner.put(r, i)
      i += 1
    }
    m
  }

  /** Split into code points (matches `split(w, '')` semantics used by
    * training on the vocab side).
    */
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
    val syms = codePoints(w)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val inner = ranks.get(syms(i))
        if (inner != null) {
          val r = inner.get(syms(i + 1))
          if (r != null && r < bestRank) { bestRank = r; bestI = i }
        }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        val l = syms(bestI)
        val rr = syms(bestI + 1)
        // fuse IN PLACE (write index trails read index — fusing only
        // shrinks), allocating nothing but the fused symbols themselves:
        // the previous per-iteration buffer rebuild put O(L) allocations
        // inside the per-merge loop, O(L²) across a long word's encode
        var wr = 0
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == rr) {
            syms(wr) = l + rr
            j += 2
          } else {
            syms(wr) = syms(j)
            j += 1
          }
          wr += 1
        }
        syms.takeInPlace(wr)
        continue = syms.length >= 2
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
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
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encodeWords($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}
