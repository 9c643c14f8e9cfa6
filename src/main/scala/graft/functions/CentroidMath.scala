package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Centroid assignment/ranking for IVF and SemDeDup
  * ([[graft.ops.Ivf]], `Similarity.semDeDup`).
  *
  * Why native: the previous spelling unrolled the k centroids into a
  * `greatest(struct(dot(v, lit(c₀)), 0), …)` chain — k branches and k×dim
  * literal doubles IN THE PLAN TREE, so analysis time, codegen size, and
  * task-serialization all grew linearly (and Janino's 64 KB method limit
  * capped k around a few hundred). Here the k×dim matrix rides along as ONE
  * reference object on the expression (shipped once per task binary, which
  * Spark broadcasts), and assignment is a tight j-k loop. Plan size is now
  * O(1) in k — k in the 1e4–1e6 range is limited only by the matrix fitting
  * in executor memory (1e5 × 128 dims ≈ 100 MB), not by codegen.
  *
  * Scores are left-to-right dot products — bit-identical to
  * [[DotProduct]], so the swap changes no assignment on tie-free input.
  * Ties (exactly equal scores) break toward the SMALLER centroid id in
  * both expressions.
  */
case class NearestCentroidId(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val n = math.min(cc.length, x.numElements())
      var s = 0.0
      var j = 0
      while (j < n) { s += cc(j) * x.getDouble(j); j += 1 }
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |int $best = 0;
         |double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cc = $mat[$c];
         |  int $n = java.lang.Math.min($cc.length, $v.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $cc[$j] * $v.getDouble($j);
         |  }
         |  if ($s > $bestS) { $bestS = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

/** The `nProbe` centroid ids nearest to the input vector, best first
  * (score descending, ties toward the smaller id). Query-side probe
  * selection for IVF search: one row per QUERY evaluates this, so the
  * O(k log k) sort per call is off the corpus hot path and eval-mode
  * (CodegenFallback) costs nothing measurable — while removing the old
  * explode-k-structs + window row_number plan, whose per-query k-row fanout
  * and extra shuffle DID sit in the query path.
  */
case class TopCentroidIds(child: Expression, centroids: Array[Array[Double]],
                          nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (nProbe > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: nProbe must be positive")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cc = centroids(c)
      val n = math.min(cc.length, x.numElements())
      var s = 0.0
      var j = 0
      while (j < n) { s += cc(j) * x.getDouble(j); j += 1 }
      scores(c) = s
      c += 1
    }
    // stable sort on descending score: equal scores keep ascending-id order
    val ids = Array.range(0, k).sortBy(i => -scores(i))
    new GenericArrayData(ids.take(math.min(nProbe, k)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "top_centroids"
}

/** Affine map `y = M·x − b` over an array<double> OR array<float> vector —
  * the projection kernel of [[graft.ops.Pca]] (b = M·mean folds the
  * centering into the offset, so the per-row work is exactly one
  * mat-vec). Same plan-reference-matrix shape as [[NearestCentroidId]]:
  * M and b ride as TWO reference objects, plan size O(1) in both
  * dimensions, and the double loop codegens into the whole-stage span.
  * Float input is widened per ELEMENT in the multiply — accepting it
  * natively (rather than via `transform(x, cast)`) matters because that
  * higher-order function breaks the codegen span right at the hot loop
  * (same reasoning as [[Int8DotProduct]]). Rows shorter than M's column
  * count treat missing entries as 0 (consistent with [[DotProduct]]'s
  * min-length contract).
  */
case class MatVecAffine(child: Expression, m: Array[Array[Double]],
                        b: Array[Double])
    extends UnaryExpression {

  require(m.nonEmpty && m.length == b.length,
    "matrix rows and offset length must match")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> or array<float>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType == ArrayType(FloatType, containsNull = false) ||
      child.dataType == ArrayType(FloatType, containsNull = true)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      val n = math.min(row.length, x.numElements())
      var s = 0.0
      var j = 0
      while (j < n) {
        s += row(j) * (if (fl) x.getFloat(j).toDouble else x.getDouble(j))
        j += 1
      }
      out(r) = s - b(r)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("matrix", m, "double[][]")
      val off = ctx.addReferenceObj("offset", b, "double[]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val get = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
         |double[] $out = new double[$mat.length];
         |for (int $r = 0; $r < $mat.length; $r++) {
         |  double[] $row = $mat[$r];
         |  int $n = java.lang.Math.min($row.length, $v.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $row[$j] * $get;
         |  }
         |  $out[$r] = $s - $off[$r];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "mat_vec_affine"
}
