package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pca, Similarity}

class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("jacobiEigen: exact on a hand-built symmetric matrix") {
    // A = R diag(5,2) Rᵀ for a 30° rotation R — eigenpairs known in closed form
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val a = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * c * s),
      Array((5 - 2) * c * s, 5 * s * s + 2 * c * c))
    val (vals, vecs) = Pca.jacobiEigen(a)
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 5.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 2.0) < 1e-12)
    // leading eigenvector ∝ (cos30, sin30)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    val flip = if (v0(0) < 0) -1.0 else 1.0
    assert(math.abs(flip * v0(0) - c) < 1e-12 && math.abs(flip * v0(1) - s) < 1e-12)
  }

  test("fit on the embeddings fixture: spectral identities hold") {
    val emb = Tables.embeddings(spark, sf)
    val model = Pca.fit(emb, "embedding")
    val d = model.mean.length
    assert(model.eigenvalues.length == d && model.components.length == d)
    // descending, non-negative (covariance is PSD)
    model.eigenvalues.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    assert(model.eigenvalues.last > -1e-10)
    // components orthonormal: max |CCᵀ − I| tiny
    var maxDev = 0.0
    for (i <- 0 until d; j <- i until d) {
      val dot = model.components(i).zip(model.components(j)).map(t => t._1 * t._2).sum
      maxDev = math.max(maxDev, math.abs(dot - (if (i == j) 1.0 else 0.0)))
    }
    assert(maxDev < 1e-10, s"orthonormality deviation $maxDev")
    // Σλ == trace(cov), trace computed independently via var_samp per dim
    val varCols = (0 until d).map(i =>
      var_samp(element_at(col("__v"), i + 1)).as(s"v$i"))
    val row = emb.select(Similarity.asDouble(col("embedding")).as("__v"))
      .agg(varCols.head, varCols.tail: _*).head()
    val trace = (0 until d).map(row.getDouble).sum
    assert(math.abs(model.eigenvalues.sum - trace) / trace < 1e-10)
    // projected first-component variance equals the top eigenvalue
    val proj = Pca.project(emb, "embedding", model, k = 2)
    val v0 = proj.agg(var_samp(element_at(col("pca"), 1))).head().getDouble(0)
    assert(math.abs(v0 - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-8)
    // explained variance is monotone and hits 1 at full rank
    assert(model.explainedVariance(1) <= model.explainedVariance(8) + 1e-12)
    assert(math.abs(model.explainedVariance(d) - 1.0) < 1e-12)
  }

  test("project matches a driver-side reference and stays codegen") {
    val emb = Tables.embeddings(spark, sf).limit(50).localCheckpoint()
    val model = Pca.fit(emb, "embedding")
    val k = 3
    val got = Pca.project(emb, "embedding", model, k)
      .select(col("vec_id"), col("pca"), col("embedding")).collect()
    got.foreach { r =>
      val x = r.getSeq[Float](2).map(_.toDouble).toArray
      val y = r.getSeq[Double](1)
      for (c <- 0 until k) {
        val ref = model.components(c).zip(x).map(t => t._1 * t._2).sum -
          model.components(c).zip(model.mean).map(t => t._1 * t._2).sum
        assert(math.abs(y(c) - ref) < 1e-12)
      }
    }
    // one reference object, not d*k literals; codegen span retained
    val plan = Pca.project(Tables.embeddings(spark, sf), "embedding", model, k)
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    val lead = model.components(0)(0).toString.take(10)
    assert(!plan.contains(lead),
      s"component values leaked into the plan as literals ($lead)")
  }

  test("whitenProject yields unit variance per component") {
    val emb = Tables.embeddings(spark, sf)
    val model = Pca.fit(emb, "embedding")
    val k = 4
    val w = Pca.whitenProject(emb, "embedding", model, k)
    val vars = w.agg(
      var_samp(element_at(col("pca_white"), 1)),
      var_samp(element_at(col("pca_white"), 2)),
      var_samp(element_at(col("pca_white"), 3)),
      var_samp(element_at(col("pca_white"), 4))).head()
    for (c <- 0 until k)
      assert(math.abs(vars.getDouble(c) - 1.0) < 1e-8, s"component $c")
    // degenerate direction maps to zero, not infinity
    import spark.implicits._
    val flat = Seq(Tuple1(Seq(1.0f, 5.0f)), Tuple1(Seq(2.0f, 5.0f)),
      Tuple1(Seq(3.0f, 5.0f))).toDF("embedding") // dim 2 is constant
    val fm = Pca.fit(flat, "embedding")
    val out = Pca.whitenProject(flat, "embedding", fm, 2)
      .select(element_at(col("pca_white"), 2)).collect().map(_.getDouble(0))
    assert(out.forall(_ == 0.0))
  }

  test("fit rejects degenerate input and ragged vectors") {
    import spark.implicits._
    val one = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("embedding")
    assertThrows[IllegalArgumentException](Pca.fit(one, "embedding"))
    val ragged = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(1.0f))).toDF("embedding")
    val e = intercept[Exception](Pca.fit(ragged, "embedding"))
    assert(e.getMessage.contains("ragged") ||
      (e.getCause != null && e.getCause.getMessage.contains("ragged")))
  }

  test("frequentDirections: exact under capacity, FD bound under any partitioning") {
    import spark.implicits._
    import graft.ops.Pca
    // deterministic structured vectors, d=8
    def vec(i: Int): Seq[Double] = (0 until 8).map(j =>
      ((i * (j + 3)) % 11 - 5).toDouble / 4.0 + (if (j == i % 8) 2.0 else 0.0))
    def ata(rows: Seq[Seq[Double]]): Array[Double] = {
      val g = new Array[Double](8)
      rows.foreach(r => (0 until 8).foreach(j => g(j) += r(j) * r(j)))
      g
    }
    // 1) n <= ell: no shrink ever fires → BᵀB == AᵀA up to float order
    val small = (1 to 10).map(i => Tuple1(vec(i))).toDF("v")
    val skS = Pca.frequentDirections(small, "v", ell = 16)
    val exact = ata((1 to 10).map(vec))
    assert(skS.n == 10L && skS.rows.length == 10)
    skS.gramDiag.zip(exact).foreach { case (b, a) =>
      assert(math.abs(b - a) < 1e-9, s"$b vs $a") }
    // 2) shrink regime: 400 rows, ell=4 → per-direction loss in
    //    [0, frob2/ell] — the FD guarantee — under both partitionings
    val rows = (1 to 400).map(vec)
    val big = rows.map(Tuple1(_)).toDF("v")
    val exactBig = ata(rows)
    for (df <- Seq(big, big.repartition(7))) {
      val sk = Pca.frequentDirections(df, "v", ell = 4)
      assert(sk.n == 400L && sk.rows.length <= 4)
      val bound = sk.frob2 / sk.ell
      sk.gramDiag.zip(exactBig).foreach { case (b, a) =>
        val gap = a - b
        assert(gap >= -1e-6 && gap <= bound + 1e-6,
          s"FD bound violated: gap $gap bound $bound")
      }
      // the sketch is genuinely lossy here (shrinks fired)
      assert(sk.gramDiag.sum < exactBig.sum)
    }
    assert(scala.util.Try(
      Pca.frequentDirections(small, "v", ell = 1)).isFailure)
  }
}
