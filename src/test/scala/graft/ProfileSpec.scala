package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("numericProfile: counts, nulls, distincts, min/max per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (2.0, null), (3.0, 30.0))
      .toDF("x", "y")
    val rows = Profile.numericProfile(df, Seq("x", "y"))
      .orderBy("col_name").collect()
    val x = rows(0); val y = rows(1)
    assert(x.getString(0) == "x" && x.getLong(1) == 4 && x.getLong(2) == 0 &&
      x.getLong(3) == 3 && x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0)
    assert(y.getString(0) == "y" && y.getLong(1) == 4 && y.getLong(2) == 1 &&
      y.getLong(3) == 2 && y.getDouble(4) == 10.0 && y.getDouble(5) == 30.0)
  }

  test("numericProfile approx mode: no Expand, distincts within HLL tolerance") {
    import graft.ops.Profile
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_quantity", "l_extendedprice", "l_partkey")
    val exact = Profile.numericProfile(li, cols).orderBy("col_name").collect()
    val approx = Profile.numericProfile(li, cols, approxDistinct = true)
      .orderBy("col_name").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      assert(e.getDouble(4) == a.getDouble(4) && e.getDouble(5) == a.getDouble(5))
      val (ne, na) = (e.getLong(3), a.getLong(3))
      assert(math.abs(na - ne) <= math.max(2L, (ne * 0.1).toLong),
        s"${e.getString(0)}: approx $na vs exact $ne")
    }
    val plan = Profile.numericProfile(li, cols, approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx mode must not fan rows\n$plan")
  }

  test("fixedHistogram: clamping at both edges, nulls dropped") {
    import spark.implicits._
    val df = Seq[java.lang.Double](-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, null)
      .toDF("v")
    val got = Profile.fixedHistogram(df, "v", lo = 0.0, width = 10.0, nBins = 3)
      .orderBy("bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 clamps to bin 0; 0, 9.9 → bin 0; 10 → bin 1; 25, 99 clamp → bin 2
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 2L))
  }

  test("correlationMatrix matches built-in corr and hits exact endpoints") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 1.0, -x, math.sin(x) * 100.0, 7.0)
    }.toDF("x", "lin", "neg", "noise", "const")
    val got = Profile.correlationMatrix(df, Seq("x", "lin", "neg", "noise", "const"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
      .toMap
    assert(got(("x", "lin")) == 1.0)   // exact affine → exactly 1 after round(6)
    assert(got(("x", "neg")) == -1.0)
    assert(got(("x", "const")) == null) // zero variance → undefined
    val builtin = df.select(corr("x", "noise")).head().getDouble(0)
    assert(math.abs(got(("x", "noise")) - builtin) < 1e-5,
      s"decimal-exact corr ${got(("x", "noise"))} vs built-in $builtin")
  }

  test("correlationMatrix drops null rows per pair (SQL corr semantics)") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 1.0, 5.0), (2.0, 2.0, null), (3.0, 3.0, 9.0), (4.0, 4.0, 13.0))
      .toDF("a", "b", "c")
    val rows = Profile.correlationMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("a", "b")) == 4)  // no nulls in (a,b)
    assert(rows(("a", "c")) == 3)  // the null c row drops only from c pairs
  }

  test("zscoreOutliers flags exactly the planted spike; constant groups are silent") {
    import spark.implicits._
    import graft.ops.Profile
    // group a: 100 values at 10±1 plus one spike at 1000 — only the spike
    // exceeds 3 sigma. group b: constant -> std 0 -> nothing flagged even
    // though every |v-mean| is 0 (guard against 0/0).
    val rows = (1 to 100).map(i => ("a", 10.0 + (i % 3 - 1))) ++
      Seq(("a", 1000.0)) ++ (1 to 50).map(_ => ("b", 7.0))
    val df = rows.toDF("g", "v")
    val got = Profile.zscoreOutliers(df, "g", "v", zThreshold = 3.0).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a" && got.head.getDouble(1) == 1000.0)
    assert(got.head.getDouble(2) > 3.0) // z itself reported
  }

  test("zscoreOutliers catches spikes when |mean|/std ~ 1e8 (no cancellation)") {
    import spark.implicits._
    import graft.ops.Profile
    // 1e8-magnitude stream with ±0.001 spread and one +10 spike. The naive
    // E[x²]−mean² in doubles has ulp(1e16) = 2, i.e. the entire ~1e-6
    // variance is below the subtraction's noise floor — the old formula
    // clamped var to 0 and silently reported NO outliers. The shifted
    // moments must still catch the spike.
    val base = 1e8
    val rows = (1 to 300).map(i => ("m", base + ((i % 3) - 1) * 0.001)) ++
      Seq(("m", base + 10.0))
    val got = Profile.zscoreOutliers(rows.toDF("g", "v"), "g", "v",
      zThreshold = 3.0).collect()
    assert(got.length == 1, s"expected exactly the spike, got ${got.length} rows")
    assert(got.head.getDouble(1) == base + 10.0)
    assert(got.head.getDouble(2) > 3.0)
  }

  test("zscoreOutliers results are identical with and without the broadcast hint") {
    import spark.implicits._
    import graft.ops.Profile
    val rows = (1 to 100).map(i => ("a", 10.0 + (i % 3 - 1))) ++
      Seq(("a", 1000.0)) ++ (1 to 50).map(_ => ("b", 7.0))
    val df = rows.toDF("g", "v")
    def run(b: Boolean) = Profile.zscoreOutliers(df, "g", "v", zThreshold = 3.0,
      broadcastStats = b).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(run(true) == run(false))
  }

  test("zscoreOutliers is partition-order independent (decimal sums)") {
    import graft.ops.Profile
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", 1e8 + math.sin(i.toDouble)))
      .toDF("g", "v")
    val a = Profile.zscoreOutliers(df.repartition(1), "g", "v", zThreshold = 1.0)
      .orderBy("v").collect().map(_.getDouble(2)).toSeq
    val b = Profile.zscoreOutliers(df.repartition(32), "g", "v", zThreshold = 1.0)
      .orderBy("v").collect().map(_.getDouble(2)).toSeq
    assert(a == b, "z-scores must be bit-identical across partitionings")
  }

  test("iqrOutliers flags the planted tails; tight groups stay silent") {
    import spark.implicits._
    // group a: 1..100 plus planted extremes; fences from q1=25.75 q3=75.25:
    // IQR=49.5 → lo=-48.5, hi=149.5 — only the plants leave the band
    val base = (1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", 500.0), ("a", -300.0)) ++
      (1 to 50).map(_ => ("b", 10.0)) // constant group: IQR 0, lo=hi=10
    val got = graft.ops.Profile.iqrOutliers(base.toDF("g", "v"), "g", "v")
      .select(col("g"), col("v")).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSet == Set(("a", 500.0), ("a", -300.0)))
    // null values never flag
    val withNull = (Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None: Option[Double]))).toDF("g", "v")
    assert(graft.ops.Profile.iqrOutliers(withNull, "g", "v").count() == 0)
  }

  test("iqrOutliers results identical with and without the broadcast hint") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", i.toDouble)) :+ ("a", 999.0)).toDF("g", "v")
    def rows(b: Boolean) = graft.ops.Profile
      .iqrOutliers(df, "g", "v", broadcastStats = b)
      .orderBy("v").collect().map(_.toString).toSeq
    assert(rows(true) == rows(false))
    // and the unhinted plan is allowed to pick a non-broadcast join
    val plan = graft.ops.Profile.iqrOutliers(df, "g", "v", broadcastStats = false)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ResolvedHint"))
  }

  test("correlationMatrix is partition-order independent (decimal sums)") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i * 0.37, math.cos(i.toDouble) * 50))
      .toDF("x", "y")
    val a = Profile.correlationMatrix(df.repartition(1), Seq("x", "y"))
      .head().getDouble(3)
    val b = Profile.correlationMatrix(df.repartition(32), Seq("x", "y"))
      .head().getDouble(3)
    assert(a == b, s"corr must be bit-identical across partitionings: $a vs $b")
  }

  test("mutualInformation: independence -> 0, identity -> H, hand value") {
    import spark.implicits._
    // independent uniform 2x2: MI exactly 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq("p", "q") }
      yield (x, y)).flatMap(Seq.fill(10)(_))
    val i = Profile.mutualInformation(indep.toDF("x", "y"), "x", "y").head()
    assert(math.abs(i.getDouble(1)) < 1e-12, s"independent MI ${i.getDouble(1)}")
    assert(i.isNullAt(4) == false && math.abs(i.getDouble(4)) < 1e-12)
    // y == x: MI = H(x) = ln 2, uncertainty coefficient exactly ~1
    val ident = Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b"))
    val d = Profile.mutualInformation(ident.toDF("x", "y"), "x", "y").head()
    assert(math.abs(d.getDouble(1) - math.log(2)) < 1e-9)
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-9, s"U ${d.getDouble(4)}")
    // degenerate single-class x: H(x)=0 -> U undefined
    val degen = Profile.mutualInformation(
      Seq(("a", "p"), ("a", "q")).toDF("x", "y"), "x", "y").head()
    assert(degen.getDouble(2) == 0.0 && degen.isNullAt(4))
  }

  test("benfordAudit: powers of 2 conform, uniform magnitudes reject, zero digits present") {
    import spark.implicits._
    // leading digits of 2^i are Benford-distributed (equidistribution
    // of i*log10(2) mod 1) — must NOT reject
    val powers = (0 until 50).map(i => math.pow(2.0, i) + 0.0)
    val conform = Profile.benfordAudit(powers.toDF("v"), "v")
      .orderBy("digit").collect()
    assert(conform.length == 9)
    assert(!conform.head.getBoolean(5),
      s"powers of 2 must pass: chi2=${conform.head.getDouble(4)}")
    // uniform 100..999: every first digit equally likely — far from
    // Benford's 30% ones, must reject
    val uniform = (100 until 1000).map(_.toDouble)
    val reject = Profile.benfordAudit(uniform.toDF("v"), "v")
      .orderBy("digit").collect()
    assert(reject.head.getBoolean(5),
      s"uniform magnitudes must reject: chi2=${reject.head.getDouble(4)}")
    assert(reject.map(_.getLong(1)).forall(_ == 100L))
    // all-ones corpus: digits 2..9 still reported with n_obs = 0
    // 1e18 is past the exact-BIGINT guard -> excluded, not an overflow;
    // 0.005 is below the cents domain -> excluded
    val ones = Profile.benfordAudit(
      Seq(1.0, 10.0, 150.0, 0.0, 1.0e18, 0.005).toDF("v"), "v")
      .orderBy("digit").collect()
    assert(ones.length == 9 && ones.head.getLong(1) == 3L &&
      ones.tail.forall(_.getLong(1) == 0L),
      "zero, sub-cent and overflow-range values excluded, digit gaps kept")
    // FLOOR regression: rounding would misbin both of these
    val edge = Profile.benfordAudit(Seq(9.9999, 0.0196).toDF("v"), "v")
      .orderBy("digit").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge(9L) == 1L, "9.9999 must stay digit 9, not round to 1000")
    assert(edge(1L) == 1L, "0.0196 must stay digit 1, not round to 2")
  }

  test("cohenKappa: textbook 2x2 value, NULL exclusion, degenerate pe=1") {
    import spark.implicits._
    // 40 (y,y) + 40 (n,n) + 10 (y,n) + 10 (n,y): po=0.8, pe=0.5, kappa=0.6
    val rows = Seq.fill(40)(("y", "y")) ++ Seq.fill(40)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    val got = Profile.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(got.getLong(0) == 100L)
    assert(got.getDouble(1) == 0.8 && got.getDouble(2) == 0.5)
    assert(math.abs(got.getDouble(3) - 0.6) < 1e-12, s"kappa ${got.getDouble(3)}")
    // NULL labels are unlabeled, not disagreement
    val withNull = (rows ++ Seq((null, "y"), ("y", null))).toDF("a", "b")
    assert(Profile.cohenKappa(withNull, "a", "b").head().getLong(0) == 100L)
    // single class on both sides: pe = 1, kappa undefined (NULL)
    val degen = Profile.cohenKappa(
      Seq.fill(5)(("y", "y")).toDF("a", "b"), "a", "b").head()
    assert(degen.getDouble(2) == 1.0 && degen.isNullAt(3))
  }

  test("ksTwoSample: hand D on small samples; identical samples give D=0; nulls/other groups excluded") {
    import spark.implicits._
    // A = {1,2,3}, B = {3,4,5,6}: D peaks at v=3 (F_A=1, F_B=1/4) → 3/4.
    // Integer max: |cumA·nB − cumB·nA| = |3·4 − 1·3| = 9 over den 12.
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val r = Profile.ksTwoSample(df, "g", "v", "a", "b", numPartitions = 3)
      .head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L && r.getLong(2) == 6L)
    assert(math.abs(r.getDouble(3) - 9.0 / 12.0) < 1e-15,
      s"ks_d ${r.getDouble(3)}")
    assert(r.getBoolean(5) == (r.getDouble(3) > r.getDouble(4)))
    // identical distributions → D exactly 0; a third group and NULL
    // values must not leak into either sample
    val same = (Seq(1, 2, 9).map(("a", _)) ++ Seq(1, 2, 9).map(("b", _)) ++
      Seq(("c", 1000), ("a", 7)))
      .toDF("g", "v")
      .select(col("g"), when(col("v") === 7, lit(null)).otherwise(col("v"))
        .as("v"))
    val r2 = Profile.ksTwoSample(same, "g", "v", "a", "b").head()
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 3L)
    assert(r2.getDouble(3) == 0.0 && !r2.getBoolean(5))
    // one empty sample rejects loudly instead of dividing by zero
    intercept[IllegalArgumentException] {
      Profile.ksTwoSample(Seq(("a", 1)).toDF("g", "v"), "g", "v", "a", "b")
    }
  }

  test("winsorize: clamps at exact order statistics, preserves NULLs and row count, empty passthrough") {
    import spark.implicits._
    // 1..100: rank floor(0.1·99)=9 → lo=10; rank floor(0.9·99)=89 → hi=90
    val df = ((1 to 100).map(i => Some(i.toDouble)) ++ Seq(None))
      .toDF("v")
    val w = Profile.winsorize(df, "v", 0.1, 0.9, numPartitions = 4)
    assert(w.count() == 101)
    val agg = w.agg(min(col("v_wins")), max(col("v_wins")),
      sum(when(col("v_wins").isNull, 1).otherwise(0)),
      sum(when(col("v_wins") === col("v"), 1).otherwise(0))).head()
    assert(agg.getDouble(0) == 10.0 && agg.getDouble(1) == 90.0)
    assert(agg.getLong(2) == 1L, "NULL stays NULL")
    assert(agg.getLong(3) == 81L, "values in [10,90] pass through")
    // empty column: passthrough, no NULL-clamp poisoning
    val empty = Seq.empty[Option[Double]].toDF("v")
    assert(Profile.winsorize(empty, "v").count() == 0)
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(Profile.winsorize(allNull, "v").filter(col("v_wins").isNull)
      .count() == 2)
    intercept[IllegalArgumentException] {
      Profile.winsorize(df, "v", 0.9, 0.1)
    }
  }

  test("fleissKappa: hand value, NULL exclusion, ragged/single-rater reject, degenerate pe=1") {
    import spark.implicits._
    // 4 items x 3 raters, 2 categories:
    //   i1=AAA i2=AAA i3=AAB i4=BBB -> S=32, Po=20/24, Pe=80/144, k=5/8
    val rows = Seq(
      (1, "A"), (1, "A"), (1, "A"), (2, "A"), (2, "A"), (2, "A"),
      (3, "A"), (3, "A"), (3, "B"), (4, "B"), (4, "B"), (4, "B"))
    val got = Profile.fleissKappa(rows.toDF("item", "k"), "item", "k").head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L && got.getLong(2) == 2L)
    assert(math.abs(got.getDouble(3) - 5.0 / 6.0) < 1e-12)
    assert(math.abs(got.getDouble(4) - 5.0 / 9.0) < 1e-12)
    assert(math.abs(got.getDouble(5) - 0.625) < 1e-12, s"kappa ${got.getDouble(5)}")
    // NULL ratings are unlabeled, not a category (and must not make the
    // frame ragged when every item loses one)
    val withNull = (rows ++ Seq((1, null), (2, null), (3, null), (4, null)))
      .toDF("item", "k")
    assert(Profile.fleissKappa(withNull, "item", "k").head().getLong(0) == 4L)
    // ragged rater counts and single-rater frames reject loudly
    intercept[IllegalArgumentException] {
      Profile.fleissKappa((rows ++ Seq((1, "B"))).toDF("item", "k"),
        "item", "k").head()
    }
    intercept[IllegalArgumentException] {
      Profile.fleissKappa(Seq((1, "A"), (2, "A")).toDF("item", "k"),
        "item", "k").head()
    }
    // one category everywhere: pe = 1, kappa undefined (NULL)
    val degen = Profile.fleissKappa(
      Seq((1, "A"), (1, "A"), (2, "A"), (2, "A")).toDF("item", "k"),
      "item", "k").head()
    assert(degen.getDouble(4) == 1.0 && degen.isNullAt(5))
  }

  test("krippendorffAlpha: hand value with ragged/missing ratings; unanimity=1; degenerate NULL") {
    import spark.implicits._
    // u1: AA (term 0), u2: AB (term 2), u3: BBB (term 0), u4: A alone
    // (unpairable, excluded) → N=7, n_A=3, n_B=4, D_o=2,
    // α = 1 − 6·2/(49−25) = 0.5
    val rows = Seq((1, "A"), (1, "A"), (2, "A"), (2, "B"),
      (3, "B"), (3, "B"), (3, "B"), (4, "A"))
    val got = Profile.krippendorffAlpha(rows.toDF("u", "k"), "u", "k").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 7L &&
      got.getLong(2) == 2L)
    assert(got.getDouble(3) == 2.0, s"D_o ${got.getDouble(3)}")
    assert(got.getDouble(4) == 0.5, s"alpha ${got.getDouble(4)}")
    // NULL ratings are unlabeled — u2 drops to a single pairable rating
    val withNull = Seq((1, "A"), (1, "A"), (2, "A"),
      (2, null), (5, "B"), (5, "B"))
    val n = Profile.krippendorffAlpha(withNull.toDF("u", "k"), "u", "k")
      .head()
    assert(n.getLong(0) == 2L && n.getLong(1) == 4L)
    assert(n.getDouble(4) == 1.0, "unanimous pairable units: alpha = 1")
    // one category everywhere: D_e = 0, alpha undefined
    val degen = Profile.krippendorffAlpha(
      Seq((1, "A"), (1, "A")).toDF("u", "k"), "u", "k").head()
    assert(degen.isNullAt(4))
  }

  test("cramersV: perfect association V=1, independence V=0, zero cells counted, degenerate single category") {
    import spark.implicits._
    // x == y on a 30/70 split: chi2 = N = 100 exactly, V = 1
    val assoc = (Seq.fill(30)(("a", "a")) ++ Seq.fill(70)(("b", "b")))
      .toDF("x", "y")
    val r = Profile.cramersV(assoc, "x", "y").head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 100.0, s"chi2 ${r.getDouble(3)}")
    assert(r.getLong(4) == 1L && r.getDouble(5) == 1.0)
    // uniform 2x2: chi2 = 0, V = 0
    val indep = (Seq.fill(25)(("a", "a")) ++ Seq.fill(25)(("a", "b")) ++
      Seq.fill(25)(("b", "a")) ++ Seq.fill(25)(("b", "b"))).toDF("x", "y")
    val r2 = Profile.cramersV(indep, "x", "y").head()
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(5) == 0.0)
    // single category on one side: dof 0, V NULL; NULLs excluded
    val degen = (Seq.fill(5)(("a", "a")) ++ Seq.fill(5)(("b", "a")) ++
      Seq[(String, String)](("a", null))).toDF("x", "y")
    val r3 = Profile.cramersV(degen, "x", "y").head()
    assert(r3.getLong(0) == 10L && r3.getLong(4) == 0L && r3.isNullAt(5))
  }

  test("spearmanCorrelation: exact ±1 on monotone data, tie midranks, constant NULL") {
    import spark.implicits._
    // any monotone transform gives EXACTLY 1.0 (identical rank vectors
    // → num == denx == deny, so num/sqrt(num·num) is exact)
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0),
      (5.0, 25.0)).toDF("x", "y")
    assert(Profile.spearmanCorrelation(mono, "x", "y").head().getDouble(1)
      == 1.0)
    val anti = mono.withColumn("y", -col("y"))
    assert(Profile.spearmanCorrelation(anti, "x", "y").head().getDouble(1)
      == -1.0)
    // ties: x=(1,1,2,3), y=(10,20,20,30). mr2 = 2·before + cnt + 1:
    // x: 1→3 (midrank 1.5), 2→6, 3→8;  y: 10→2, 20→5 (midrank 2.5), 30→8
    // → ρ = 15/18 = 0.8333…, the textbook tied-rank Spearman
    val ties = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 20.0), (3.0, 30.0))
      .toDF("x", "y")
    val got = Profile.spearmanCorrelation(ties, "x", "y").head()
    assert(got.getLong(0) == 4L)
    // reference via the same moment formula over hand midranks2
    val rx = Seq(3.0, 3.0, 6.0, 8.0); val ry = Seq(2.0, 5.0, 5.0, 8.0)
    val n = 4.0
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
    val expd = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got.getDouble(1) - expd) < 1e-12,
      s"got ${got.getDouble(1)} vs $expd")
    // layout invariance
    val re = Profile.spearmanCorrelation(ties.repartition(5), "x", "y")
      .head()
    assert(re.getDouble(1) == got.getDouble(1))
    // constant column → NULL; NULL pairs excluded
    val const = Seq((1.0, Some(5.0)), (2.0, Some(5.0)),
      (3.0, Option.empty[Double])).toDF("x", "y")
    val rc = Profile.spearmanCorrelation(const, "x", "y").head()
    assert(rc.getLong(0) == 2L && rc.isNullAt(1))
  }

  test("kendallTau: hand C/D, tie correction, constant-column NULL") {
    import spark.implicits._
    // x=1..5, y=(3,1,2,5,4): C=7, D=3, no ties → τ = 0.4 exactly
    val df = Seq((1.0, 3.0), (2.0, 1.0), (3.0, 2.0), (4.0, 5.0),
      (5.0, 4.0)).toDF("x", "y")
    val r = Profile.kendallTau(df, "x", "y").head()
    assert(r.getLong(0) == 5L && r.getDouble(1) == 7.0 &&
      r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 0.4)
    // ties in x: x=(1,1,2), y=(1,2,3) → C=2, D=0, τ_b = 4/√24
    val t = Profile.kendallTau(
      Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y"), "x", "y")
      .head()
    assert(t.getDouble(1) == 2.0 && t.getDouble(2) == 0.0)
    assert(math.abs(t.getDouble(3) - 4.0 / math.sqrt(24.0)) < 1e-15)
    // constant x: denominator 0 → NULL
    val c = Profile.kendallTau(
      Seq((1.0, 1.0), (1.0, 2.0)).toDF("x", "y"), "x", "y").head()
    assert(c.isNullAt(3))
  }

  test("pettittTest: level shift found at the exact split; contracts enforced") {
    import spark.implicits._
    // 5 zeros then 5 tens: U_t = −5t for t ≤ 5 → K = 25 at t = 5
    val df = (1 to 10).map(t => (t.toDouble, if (t <= 5) 0.0 else 10.0))
      .toDF("t", "x")
    val r = Profile.pettittTest(df, "t", "x").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 25L &&
      r.getDouble(2) == 5.0)
    val pExp = 2.0 * math.exp(-6.0 * 625.0 / 1100.0)
    assert(math.abs(r.getDouble(3) - pExp) < 1e-15)
    assert(!r.getBoolean(4)) // p ≈ 0.066 — a 10-point series can't reach 0.05
    // a longer run with the same clean shift IS significant
    val long = (1 to 30).map(t => (t.toDouble, if (t <= 15) 0.0 else 10.0))
      .toDF("t", "x")
    val rl = Profile.pettittTest(long, "t", "x").head()
    assert(rl.getLong(1) == 225L && rl.getDouble(2) == 15.0 &&
      rl.getBoolean(4))
    // layout invariance
    val r7 = Profile.pettittTest(df.repartition(7), "t", "x").head()
    assert(r7.getLong(1) == 25L && r7.getDouble(2) == 5.0)
    // duplicate order values rejected; tiny input rejected
    intercept[IllegalArgumentException] {
      Profile.pettittTest(df.withColumn("t", lit(1.0)), "t", "x").head()
    }
    intercept[IllegalArgumentException] {
      Profile.pettittTest(df.limit(1), "t", "x").head()
    }
  }

  test("pettittTestGrouped == global pettittTest per series; dup order raises") {
    import spark.implicits._
    // series A: the 10-point shift fixture; series B: the 30-point one
    val df = ((1 to 10).map(t => ("A", t.toDouble,
        if (t <= 5) 0.0 else 10.0)) ++
      (1 to 30).map(t => ("B", t.toDouble, if (t <= 15) 0.0 else 10.0)))
      .toDF("g", "t", "x")
    val got = Profile.pettittTestGrouped(df, Seq("g"), "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(5))).toMap
    assert(got("A") == (10L, 25L, 5.0, false), s"A: ${got("A")}")
    assert(got("B") == (30L, 225L, 15.0, true), s"B: ${got("B")}")
    // per-group p equals the global flavor's p bit-for-bit
    val pa = Profile.pettittTest(df.filter(col("g") === "A"), "t", "x")
      .head().getDouble(3)
    val pg = Profile.pettittTestGrouped(df, Seq("g"), "t", "x")
      .filter(col("g") === "A").head().getDouble(4)
    assert(pa == pg, s"grouped p $pg != global p $pa")
    // duplicate order value inside ONE group raises in-plan
    val dup = df.unionByName(Seq(("A", 5.0, 3.0)).toDF("g", "t", "x"))
    val e = intercept[Exception] {
      Profile.pettittTestGrouped(dup, Seq("g"), "t", "x").collect()
    }
    assert(e.getMessage != null)
  }

  test("bhFdr: hand step-up, monotone adjusted p, out-of-range p raises") {
    import spark.implicits._
    // p = .01 .02 .04 .20 at α = .05, m = 4: thresholds i·α/m =
    // .0125 .025 .0375 .05 → k* = 2; p_adj (reverse running min of
    // m·p/i) = .04 .04 .0533… .20
    val df = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.20), ("t4", 0.04))
      .toDF("test", "p")
    val r = Profile.bhFdr(df, Seq("test"), "p", 1L, 20L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getDouble(4), x.getBoolean(3))).toMap
    assert(r("t1")._1 == 1L && r("t2")._1 == 2L && r("t4")._1 == 3L &&
      r("t3")._1 == 4L, s"ranks: $r")
    assert(r("t1")._3 && r("t2")._3 && !r("t4")._3 && !r("t3")._3,
      s"discoveries: $r")
    assert(r("t1")._2 == 0.04 && r("t2")._2 == 0.04 &&
      r("t3")._2 == 0.20, s"p_adj: $r")
    assert(math.abs(r("t4")._2 - 0.04 * 4 / 3) < 1e-15, s"p_adj t4: $r")
    // all columns pass through; p outside [0,1] raises in-plan
    val e = intercept[Exception] {
      Profile.bhFdr(Seq(("t", 1.5)).toDF("test", "p"),
        Seq("test"), "p").collect()
    }
    assert(e.getMessage != null)
  }

  test("giniConcentration: 0 on equality, (n-1)/n on a point mass, negatives rejected") {
    import spark.implicits._
    val eq = Seq(7.0, 7.0, 7.0, 7.0).toDF("v")
    val re = Profile.giniConcentration(eq, "v").head()
    assert(re.getLong(0) == 4L && re.getDouble(1) == 28.0 &&
      re.getDouble(2) == 0.0)
    // one owner of everything: G = (n−1)/n = 0.75 at n=4
    val pm = Seq(0.0, 0.0, 0.0, 1.0).toDF("v")
    assert(Profile.giniConcentration(pm, "v").head().getDouble(2) == 0.75)
    // layout invariance on a mixed multiset
    val mix = Seq(1.0, 1.0, 2.0, 5.0, 5.0, 10.0).toDF("v")
    val g1 = Profile.giniConcentration(mix, "v").head().getDouble(2)
    val g2 = Profile.giniConcentration(mix.repartition(5), "v").head()
      .getDouble(2)
    assert(g1 == g2 && g1 > 0.0 && g1 < 1.0)
    intercept[IllegalArgumentException] {
      Profile.giniConcentration(Seq(1.0, -2.0).toDF("v"), "v").head()
    }
  }

  test("fdrCorrect: textbook BH ladder, cap at 1, NULL passthrough") {
    import spark.implicits._
    val df = Seq(("a", Some(0.005)), ("b", Some(0.011)), ("c", Some(0.02)),
      ("d", Some(0.04)), ("e", Some(0.1))).toDF("id", "p")
    val got = Profile.fdrCorrect(df, "p").orderBy("id").collect()
    val exp = Seq(0.005 * 5 / 1, 0.011 * 5 / 2, 0.02 * 5 / 3, 0.04 * 5 / 4,
      0.1 * 5 / 5)
    // this ladder is already its own suffix min
    got.zip(exp).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(2) - e) < 1e-15, s"$r vs $e")
    }
    assert(got.map(_.getBoolean(3)).toSeq ==
      Seq(true, true, true, true, false))
    // a later small p pulls earlier adjusted values down (suffix min)
    val df2 = Seq(("a", 0.04), ("b", 0.041)).toDF("id", "p")
    val g2 = Profile.fdrCorrect(df2, "p").orderBy("id").collect()
    assert(g2(0).getDouble(2) == 0.041 && g2(1).getDouble(2) == 0.041)
    // NULL p rows pass through with NULL outputs and don't count in m
    val df3 = Seq(("a", Some(0.9)), ("b", Option.empty[Double]))
      .toDF("id", "p")
    val g3 = Profile.fdrCorrect(df3, "p").orderBy("id").collect()
    assert(g3(0).getDouble(2) == 0.9 && g3(1).isNullAt(2) &&
      g3(1).isNullAt(3))
  }

  test("mannKendallTrend: monotone series flagged, constant none, ties zero variance") {
    import spark.implicits._
    val rows =
      (1 to 8).map(t => ("up", t.toDouble, t.toDouble)) ++
        (1 to 8).map(t => ("down", t.toDouble, -t.toDouble)) ++
        (1 to 8).map(t => ("flat", t.toDouble, 7.0)) ++
        Seq(("solo", 1.0, 5.0)) // no pairs at all: S = 0, kept in output
    val got = Profile.mannKendallTrend(rows.toDF("g", "t", "x"),
        Seq("g"), "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("up") == ((8L, 28.0, 8.0 * 7.0 * 21.0 / 18.0)))
    assert(got("down")._2 == -28.0)
    // flat: S = 0 and the single 8-way tie kills the variance → z NULL
    val flat = Profile.mannKendallTrend(rows.toDF("g", "t", "x"),
        Seq("g"), "t", "x")
      .filter(col("g") === "flat").head()
    assert(flat.getDouble(2) == 0.0 && flat.getDouble(3) == 0.0 &&
      flat.isNullAt(4) && flat.getString(5) == "none")
    val trends = Profile.mannKendallTrend(rows.toDF("g", "t", "x"),
        Seq("g"), "t", "x")
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(trends == Map("up" -> "increasing", "down" -> "decreasing",
      "flat" -> "none", "solo" -> "none"))
    assert(got("solo") == ((1L, 0.0, 0.0)))
    // z value: continuity-corrected 27/sqrt(var)
    val up = Profile.mannKendallTrend(rows.toDF("g", "t", "x"),
      Seq("g"), "t", "x").filter(col("g") === "up").head()
    assert(math.abs(up.getDouble(4) -
      27.0 / math.sqrt(8.0 * 7.0 * 21.0 / 18.0)) < 1e-12)
  }

  test("theilSenSlope: outlier-robust exact median slope and intercept") {
    import spark.implicits._
    // y = 2x+1 with one wild outlier: 6 of 10 pair slopes are exactly 2
    val df = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0),
      (5.0, 100.0)).toDF("x", "y")
    val r = Profile.theilSenSlope(df, "x", "y").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
    // all x equal: no non-vertical pair → NULL slope row
    val v = Profile.theilSenSlope(
      Seq((1.0, 1.0), (1.0, 2.0)).toDF("x", "y"), "x", "y").head()
    assert(v.getLong(1) == 0L && v.isNullAt(2) && v.isNullAt(3))
  }

  test("rankSumTest: textbook U, effect size == rocAuc, tie-only z NULL") {
    import spark.implicits._
    // A=(1,2,4), B=(3,5,6): R_a=7 → U_a=1; no ties
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 3.0),
      ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Profile.rankSumTest(df, "g", "v", "a", "b").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1.0) // U_a exactly 1
    assert(math.abs(r.getDouble(3) - 1.0 / 9.0) < 1e-15)
    val zExp = (2.0 * 1.0 - 9.0) / (2.0 * math.sqrt(9.0 * 7.0 / 12.0))
    assert(math.abs(r.getDouble(4) - zExp) < 1e-12)
    assert(!r.getBoolean(5)) // |z| ≈ 1.53 < 1.96
    // effect size IS rocAuc with group a as positives (same statistic)
    val auc = graft.ops.Classifier.rocAuc(
      df.withColumn("y", when(col("g") === "a", 1).otherwise(0)),
      "v", "y").head().getDouble(2)
    assert(math.abs(r.getDouble(3) - auc) < 1e-15,
      s"rank-sum effect ${r.getDouble(3)} vs AUC $auc")
    // all-tied values: Var = 0 → z NULL, effect 1/2
    val tied = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0)).toDF("g", "v")
    val rt = Profile.rankSumTest(tied, "g", "v", "a", "b").head()
    assert(rt.getDouble(3) == 0.5 && rt.isNullAt(4) && rt.isNullAt(5))
  }

  test("quadratic-contract guards reject loudly; empty fleissKappa named") {
    import spark.implicits._
    // kendallTau: 4 distinct combos > maxCombos=3 → loud reject
    val k = intercept[IllegalArgumentException] {
      Profile.kendallTau(Seq((1.0, 1.0), (2.0, 4.0), (3.0, 2.0),
        (4.0, 3.0)).toDF("x", "y"), "x", "y", maxCombos = 3)
    }
    assert(k.getMessage.contains("spearmanCorrelation"))
    // ...and the guard ignores duplicate rows (combo plane, not rows)
    val dup = Seq((1.0, 1.0), (1.0, 1.0), (2.0, 2.0), (2.0, 2.0))
      .toDF("x", "y")
    assert(Profile.kendallTau(dup, "x", "y", maxCombos = 2)
      .head().getLong(0) == 4L)
    // theilSenSlope: 3 points > maxRows=2 → reject BEFORE the pair join
    val t = intercept[IllegalArgumentException] {
      Profile.theilSenSlope(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0))
        .toDF("x", "y"), "x", "y", maxRows = 2)
    }
    assert(t.getMessage.contains("quadratic"))
    // mannKendallTrend: tied order values now rejected (r15 ADVICE)
    val m = intercept[IllegalArgumentException] {
      Profile.mannKendallTrend(Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0),
        ("g", 2.0, 3.0)).toDF("g", "t", "x"), Seq("g"), "t", "x").collect()
    }
    assert(m.getMessage.contains("unique"))
    // fleissKappa on zero pairable rows: contract error, not an NPE
    val e = intercept[IllegalArgumentException] {
      Profile.fleissKappa(Seq((null.asInstanceOf[String], "A"))
        .toDF("item", "k"), "item", "k")
    }
    assert(e.getMessage.contains("no non-NULL"))
  }

  test("kAnonymityReport: exact class counting, l-diversity, NULL classes") {
    import spark.implicits._
    // classes on (zip, age): (a,1)×3 {x,y}, (a,2)×2 {x,x}, (b,1)×1 {z},
    // (NULL,1)×2 {x,z} — NULL is its own class
    val rows = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"),
      ("a", 2, "x"), ("a", 2, "x"),
      ("b", 1, "z"),
      (null.asInstanceOf[String], 1, "x"), (null.asInstanceOf[String], 1, "z"))
      .toDF("zip", "age", "diag")
    val r = Profile.kAnonymityReport(rows, Seq("zip", "age"), k = 2,
      sensitiveCol = Some("diag"), l = 2).head()
    assert(r.getLong(0) == 8L && r.getLong(1) == 4L) // n_rows, n_classes
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // min size, rows below k
    assert(!r.getBoolean(4))                          // (b,1) breaks k=2
    assert(r.getLong(5) == 1L && r.getLong(6) == 3L)  // min_l; (a,2)+(b,1) rows
    assert(!r.getBoolean(7))
    // k=1, l=1 always holds; no sensitive column → NULL l columns
    val ok = Profile.kAnonymityReport(rows, Seq("zip", "age"), k = 1).head()
    assert(ok.getBoolean(4) && ok.isNullAt(5) && ok.isNullAt(6) &&
      ok.isNullAt(7))
    assert(scala.util.Try(
      Profile.kAnonymityReport(rows, Seq(), k = 2)).isFailure)
  }

  test("dawidSkene: EM rescues tie-broken items via learned annotator quality") {
    import spark.implicits._
    // A, B honest; C, D always answer x; E honest but only rates i1/i2.
    // i1-i4 true y, i5-i9 true x. Majority vote: i1/i2 = y (E breaks the
    // tie), i3/i4 = TIE → 'x' (smaller label — WRONG). Round-1 EM learns
    // from the fully-annotated items that C/D answer x on y-items while
    // A/B are reliable: score(i3, y) = ln(3/11)+4·ln(3/4) = ln(243/2816)
    // beats score(i3, x) = ln(8/11)+2·ln(3/9)+2·ln(8/9) = ln(512/8019),
    // so DS flips i3/i4 to y.
    val good = (1L to 4L).flatMap(i => Seq(("A", i, "y"), ("B", i, "y"),
      ("C", i, "x"), ("D", i, "x")))
    val e = Seq(("E", 1L, "y"), ("E", 2L, "y"))
    val xs = (5L to 9L).flatMap(i =>
      Seq("A", "B", "C", "D").map(j => (j, i, "x")))
    val ann = (good ++ e ++ xs).toDF("rater", "item", "label")
    val out = Profile.dawidSkene(ann, "item", "rater", "label", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == (("y", "y", 5L)) && out(2L) == (("y", "y", 5L)))
    assert(out(3L) == (("x", "y", 4L)), s"i3: ${out(3L)}")
    assert(out(4L) == (("x", "y", 4L)))
    (5L to 9L).foreach(i => assert(out(i) == (("x", "x", 4L))))
    // unanimous annotations are a fixpoint
    val unanimous = Seq(("A", 1L, "p"), ("B", 1L, "p"), ("A", 2L, "q"),
      ("B", 2L, "q")).toDF("rater", "item", "label")
    val u = Profile.dawidSkene(unanimous, "item", "rater", "label")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(u == Map(1L -> "p", 2L -> "q"))
    assert(scala.util.Try(Profile.dawidSkene(ann, "item", "rater", "label",
      rounds = 0)).isFailure)
  }
}
