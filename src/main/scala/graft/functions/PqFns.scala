package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels for [[graft.ops.Ivf]]'s PQ serving tier
  * (Jégou, Douze & Schmid, TPAMI 2011 — the compression behind
  * FAISS IVFPQ): the vector is split into m sub-vectors, each encoded as
  * ONE byte (the id of its nearest codebook centroid), so a dim-d double
  * vector stores in m bytes — the next ~4× past scalar int8 (dim bytes +
  * scale). Codebooks ride the plan as ONE reference object (the
  * [[MatVecAffine]] matrix pattern), never as literal doubles.
  */

/** array<double> vector → m-byte PQ code: per subspace, the L2-nearest of
  * that subspace's codebook centroids (ties toward the smaller id, so
  * encoding is deterministic). NULL when the vector's length differs from
  * the codebooks' total dimension — a silently zero-padded code would
  * rank the vector arbitrarily with nothing to surface the mismatch (the
  * kernel NULL-on-out-of-scope convention). Corpus-scale projection —
  * codegen'd static loop, no allocation besides the m-byte result.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be non-empty per subspace")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      s"""
         |${ev.value} = graft.functions.PqKernel.encode($c, $books);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** unit query vector → flattened ADC lookup table: lut[s·K + c] =
  * dot(codebook[s][c], querySub[s]). Evaluated once per (query, probe)
  * row in the broadcast-side probe frame — never per candidate — so
  * eval-mode CodegenFallback costs nothing measurable; the per-candidate
  * hot loop is [[PqAdcScore]].
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val m = codebooks.length
    if (q.numElements() != codebooks.map(_(0).length).sum) return null // dim mismatch
    val kMax = codebooks.map(_.length).max
    val lut = new Array[Double](m * kMax)
    var s = 0
    var off = 0 // element offset of subspace s within the full vector
    while (s < m) {
      val book = codebooks(s)
      val subDim = book(0).length
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          d += cent(j) * q.getDouble(off + j)
          j += 1
        }
        lut(s * kMax + c) = d
        c += 1
      }
      off += subDim
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"
}

/** (code binary, lut array<double>) → approximate dot score: Σ_s
  * lut[s·K + code[s]]. K (the per-subspace stride) is baked in at plan
  * time. O(m) per candidate — the FAISS ADC loop — vs O(dim) for the
  * int8 tier; codegen'd.
  *
  * NULL when the code's length disagrees with the LUT (lut length must
  * be m·K) or any code byte ≥ K: the expression is registered as a
  * public SQL function, so malformed binary input follows the kernel
  * NULL-on-out-of-scope convention instead of reading another
  * subspace's LUT slot or throwing. The checks are one compare per
  * loop iteration against values already in registers — nothing
  * measurable in the per-candidate hot loop.
  */
case class PqAdcScore(left: Expression, right: Expression, kPerSub: Int)
    extends BinaryExpression {

  require(kPerSub >= 1, "kPerSub must be positive")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    if (lut.numElements().toLong != code.length.toLong * kPerSub) return null
    var s = 0.0
    var i = 0
    while (i < code.length) {
      val c = code(i) & 0xff
      if (c >= kPerSub) return null
      s += lut.getDouble(i * kPerSub + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val ok = ctx.freshName("ok")
      s"""
         |if ($b.numElements() != ((long) $a.length) * ${kPerSub}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $a.length; $i++) {
         |    int $c = ((int) $a[$i]) & 0xff;
         |    if ($c >= $kPerSub) { $ok = false; }
         |    else { $s += $b.getDouble($i * $kPerSub + $c); }
         |  }
         |  if ($ok) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_score"
}

/** Static encode kernel (shared by eval and generated code). */
object PqKernel {
  /** null when the vector length differs from the codebooks' total dim. */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = codebooks.length
    var total = 0
    var t = 0
    while (t < m) { total += codebooks(t)(0).length; t += 1 }
    if (v.numElements() != total) return null // dim mismatch: NULL, not zero-pad
    val out = new Array[Byte](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = codebooks(s)
      val subDim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v.getDouble(off + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict < keeps smaller id on ties
        c += 1
      }
      out(s) = best.toByte
      off += subDim
      s += 1
    }
    out
  }
}
