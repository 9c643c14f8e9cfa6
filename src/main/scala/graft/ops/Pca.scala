package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** Principal component analysis over an embedding column — the standard
  * dimensionality-reduction / whitening step of an embedding-curation
  * pipeline (and the building block of PQ-style codebooks and Matryoshka
  * truncation checks).
  *
  * Scale shape, 100 TB discipline:
  *   - `fit` is ONE distributed pass: a `treeAggregate` accumulates
  *     (n, Σx, upper-triangular Σxxᵀ) per partition — d(d+3)/2 doubles of
  *     driver traffic per tree leaf, independent of row count (d=768 ≈
  *     2.4 MB; the corpus itself never moves). The RDD drop-down is the
  *     sanctioned per-partition-imperative case: a d×d accumulator has no
  *     declarative spelling that avoids a d²-column Expand.
  *   - the eigensolve runs on the DRIVER on the d×d covariance (cyclic
  *     Jacobi — public textbook algorithm, Golub & Van Loan §8.5; d ≤ a
  *     few thousand, microseconds-to-seconds, no cluster involvement).
  *   - `project` is a pure projection: one codegen'd
  *     [[graft.functions.MatVecAffine]] per row (y = C·x − C·mean, the
  *     centering folded into the offset), components riding the plan as
  *     ONE reference object. Zero shuffles.
  *
  * Numerics: raw-moment covariance (Σxxᵀ/n − μμᵀ shape) loses digits when
  * |mean| ≫ std per coordinate — embeddings are bounded near the origin,
  * where the one-pass form is exact to ~1e-12 relative; for wild-mean
  * numeric tables use [[Profile.zscoreOutliers]]'s shifted-moment per-
  * column stats instead. q99 pins the eigen sum to an independently
  * DECIMAL-replayed trace, so a numerics regression fails the oracle.
  */
object Pca extends Serializable {

  /** Fitted model: `mean` (length d), `eigenvalues` of the SAMPLE
    * covariance, descending (length d), `components` — the matching
    * orthonormal eigenvectors as rows (d × d; `project` takes the top k).
    */
  case class PcaModel(nRows: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    def explainedVariance(k: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(k).sum / tot
    }
  }

  /** One-pass distributed fit (see object doc for the scale shape).
    * Null vectors are skipped; vectors must share the first row's length.
    */
  def fit(df: DataFrame, vecCol: String): PcaModel = {
    val vecs = df.select(Similarity.asDouble(col(vecCol)).as("__v"))
      .where(col("__v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = vecs.first().length
    // (n, Σx, packed upper-triangular Σ x xᵀ) — arrays mutated in place,
    // the standard treeAggregate accumulator contract
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, s, ss) = vecs.treeAggregate(zero)(
      seqOp = { case ((cnt, sum, sq), x) =>
        require(x.length == d,
          s"ragged embedding: expected length $d, got ${x.length}")
        var i = 0
        var p = 0
        while (i < d) {
          sum(i) += x(i)
          var j = i
          while (j < d) { sq(p) += x(i) * x(j); j += 1; p += 1 }
          i += 1
        }
        (cnt + 1L, sum, sq)
      },
      combOp = { case ((n1, s1, q1), (n2, s2, q2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        var p = 0
        while (p < q1.length) { q1(p) += q2(p); p += 1 }
        (n1 + n2, s1, q1)
      })
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var p = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (ss(p) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        p += 1
      }
      i += 1
    }
    val (vals, vecsM) = jacobiEigen(cov)
    // sort eigenpairs by descending eigenvalue; vectors come back as
    // COLUMNS of vecsM — transpose the chosen order into row form
    val order = vals.indices.sortBy(k => -vals(k))
    val eigenvalues = order.map(vals).toArray
    val components = order.map(k => Array.tabulate(d)(r => vecsM(r)(k))).toArray
    PcaModel(n, mean, eigenvalues, components)
  }

  /** Project vectors onto the model's top-k components: appends `outCol` =
    * array<double> of length k. One codegen'd mat-vec per row, zero
    * shuffles, plan size O(1) in d and k.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
              outCol: String = "pca"): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    affineProject(df, vecCol, model.components.take(k), model.mean, outCol)
  }

  /** [[project]] with whitening: each component is scaled by 1/√λ, so the
    * output coordinates have unit variance (the standard preprocessing
    * for downstream distance computations and PQ codebooks; verified in
    * PcaSpec). Components whose eigenvalue is ≤ `eps` (degenerate
    * directions — no variance to normalize) map to 0 rather than blowing
    * up. Same single codegen'd mat-vec per row as [[project]].
    */
  def whitenProject(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
                    outCol: String = "pca_white",
                    eps: Double = 1e-12): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    val m = model.components.take(k).zipWithIndex.map { case (row, c) =>
      val lam = model.eigenvalues(c)
      val s = if (lam > eps) 1.0 / math.sqrt(lam) else 0.0
      row.map(_ * s)
    }
    affineProject(df, vecCol, m, model.mean, outCol)
  }

  private def affineProject(df: DataFrame, vecCol: String,
                            m: Array[Array[Double]], mean: Array[Double],
                            outCol: String): DataFrame = {
    val b = m.map(row => row.zip(mean).map { case (a, x) => a * x }.sum)
    // raw column, NOT transform(cast): MatVecAffine widens float input per
    // element, keeping the projection inside the whole-stage-codegen span
    df.withColumn(outCol, ArrayMath.matVecAffine(col(vecCol),
      typedLit(m.map(_.toSeq).toSeq), typedLit(b.toSeq)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5): sweeps of (p,q) rotations until the off-diagonal mass is
    * below 1e-22 of the squared Frobenius norm. Returns (eigenvalues,
    * eigenvector matrix with vectors as COLUMNS), unordered.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var frob2 = 0.0
    for (i <- 0 until d; j <- 0 until d) frob2 += a(i)(j) * a(i)(j)
    def off2(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- (i + 1) until d) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (sweep < 100 && off2() > 1e-22 * math.max(frob2, Double.MinPositiveValue)) {
      for (p <- 0 until d; q <- (p + 1) until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val sgn = if (theta >= 0.0) 1.0 else -1.0
        val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        var i = 0
        while (i < d) { // right-multiply columns p,q by the rotation
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - sn * aiq
          a(i)(q) = sn * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < d) { // left-multiply rows p,q
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - sn * aqi
          a(q)(i) = sn * api + c * aqi
          i += 1
        }
        i = 0
        while (i < d) { // accumulate the eigenvector rotation
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - sn * viq
          v(i)(q) = sn * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** A Frequent Directions sketch: ≤ ell rows whose Gram matrix BᵀB
    * satisfies 0 ⪯ AᵀA − BᵀB ⪯ (‖A‖_F²/ell)·I over the sketched rows A.
    */
  final case class FdSketch(ell: Int, d: Int, rows: Array[Array[Double]],
                            frob2: Double, n: Long) {
    /** diag(BᵀB) — the per-dimension second-moment estimate. */
    def gramDiag: Array[Double] = {
      val g = new Array[Double](d)
      rows.foreach { r =>
        var i = 0
        while (i < d) { g(i) += r(i) * r(i); i += 1 }
      }
      g
    }
  }

  /** Frequent Directions matrix sketch (Liberty, KDD 2013; Ghashami,
    * Liberty, Phillips & Woodruff, SIAM J. Comput. 2016) — the
    * deterministic mergeable low-rank summary of a tall matrix: stream
    * rows into a 2·ell-row buffer; when full, eigendecompose the
    * buffer's Gram matrix and SHRINK — subtract the (ell+1)-th largest
    * eigenvalue from every direction and keep the surviving ≤ ell rows.
    * Every shrink removes ≥ ell·δ of Frobenius mass while charging each
    * direction ≤ δ, so the total spectral loss telescopes to
    *
    *   0 ⪯ AᵀA − BᵀB ⪯ (‖A‖_F²/ell)·I
    *
    * under ANY insertion/merge order — which is exactly what makes it
    * the streaming/distributed alternative to [[fit]]'s exact one-pass
    * moments when d is too wide for the d²/2 accumulator (FD carries
    * 2·ell·d doubles instead).
    *
    * Scale shape: ONE treeAggregate pass; each executor keeps a
    * 2·ell×d buffer, pays one d×d Jacobi per ell inserted rows, and
    * partials MERGE by row-append + shrink (the guarantee is
    * order-free, so tree depth and partitioning don't matter). Only
    * the final ≤ ell×d matrix reaches the driver. The OUTPUT is not
    * bit-deterministic across partitionings (each order walks a
    * different shrink path) — the GUARANTEE is; certify consumers
    * against the bound, not the bytes (the q299 verdict shape).
    */
  def frequentDirections(df: DataFrame, vecCol: String,
                         ell: Int): FdSketch = {
    require(ell >= 2 && ell <= 512, s"ell must be in [2,512], got $ell")
    val vecs = df.select(Similarity.asDouble(col(vecCol)).as("__v"))
      .where(col("__v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
    val head = vecs.take(1)
    require(head.nonEmpty, "frequentDirections: no non-null vectors")
    val d = head(0).length
    val cap = 2 * ell
    def shrink(buf: Array[Array[Double]], used: Int): Int = {
      val g = Array.ofDim[Double](d, d)
      var r = 0
      while (r < used) {
        val x = buf(r)
        var i = 0
        while (i < d) {
          val xi = x(i)
          if (xi != 0.0) {
            var j = 0
            while (j < d) { g(i)(j) += xi * x(j); j += 1 }
          }
          i += 1
        }
        r += 1
      }
      val (vals, vecsM) = jacobiEigen(g)
      val order = vals.indices.sortBy(k => -vals(k))
      val delta =
        if (order.length > ell) math.max(vals(order(ell)), 0.0) else 0.0
      var w = 0
      var oi = 0
      val keep = math.min(ell, order.length)
      while (oi < keep) {
        val k = order(oi)
        val lam = vals(k) - delta
        if (lam > 1e-12) {
          val s = math.sqrt(lam)
          var i = 0
          while (i < d) { buf(w)(i) = s * vecsM(i)(k); i += 1 }
          w += 1
        }
        oi += 1
      }
      var z = w
      while (z < used) { java.util.Arrays.fill(buf(z), 0.0); z += 1 }
      w
    }
    type Acc = (Array[Array[Double]], Int, Double, Long)
    val zero: Acc = (Array.ofDim[Double](cap, d), 0, 0.0, 0L)
    val (buf, used0, frob2, n) = vecs.treeAggregate(zero)(
      seqOp = { case ((b, used, f2, cnt), x) =>
        require(x.length == d,
          s"ragged embedding: expected length $d, got ${x.length}")
        var u = used
        if (u == cap) u = shrink(b, u)
        Array.copy(x, 0, b(u), 0, d)
        var nf = f2
        var i = 0
        while (i < d) { nf += x(i) * x(i); i += 1 }
        (b, u + 1, nf, cnt + 1L)
      },
      combOp = { case ((b1, u1, f1, n1), (b2, u2, f2, n2)) =>
        var u = u1
        var r = 0
        while (r < u2) {
          if (u == cap) u = shrink(b1, u)
          Array.copy(b2(r), 0, b1(u), 0, d)
          u += 1
          r += 1
        }
        (b1, u, f1 + f2, n1 + n2)
      })
    val finalUsed = if (used0 > ell) shrink(buf, used0) else used0
    FdSketch(ell, d, buf.take(finalUsed).map(_.clone()), frob2, n)
  }
}
