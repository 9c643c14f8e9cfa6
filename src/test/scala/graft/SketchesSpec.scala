package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** KMV sketch laws: exactness below k, exact mergeability (sketch of a
  * union == re-ranked union of sketches), layout invariance, and the
  * estimator landing within the analytic error band.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("below k the sketch is the distinct set and the estimate is exact") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i % 10).toString).toDF("v")
      .withColumn("g", lit("only"))
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).head()
    assert(est.getLong(1) == 10L && est.getDouble(2) == 10.0)
  }

  test("sketches merge exactly: union-then-sketch == sketch-then-merge") {
    import spark.implicits._
    val a = spark.range(0, 3000).select(lit("g").as("g"),
      concat(lit("a"), col("id") % 2000).as("v"))
    val b = spark.range(0, 3000).select(lit("g").as("g"),
      concat(lit("a"), (col("id") % 2000) + 1000).as("v"))
    val k = 32
    val direct = Sketches.kmvSketch(a.union(b), Seq("g"), "v", k)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // merge: union the two sketches' h sets, re-rank, keep <= k
    val merged = Sketches.kmvSketch(a, Seq("g"), "v", k)
      .select("g", "h")
      .union(Sketches.kmvSketch(b, Seq("g"), "v", k).select("g", "h"))
      .distinct()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy("h")).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(direct.toSeq == merged.toSeq,
      "KMV must merge exactly: k smallest of the sketch union")
  }

  test("kmvJaccardPairs is exact below k and bounded on larger overlaps") {
    import spark.implicits._
    // sets far below k=64: the sketches ARE the sets, estimate exact.
    // a={0..9}, b={5..14} (J=5/15), c={100..104} disjoint from a (J=0)
    val df = ((0 to 9).map(i => ("a", s"v$i")) ++
      (5 to 14).map(i => ("b", s"v$i")) ++
      (100 to 104).map(i => ("c", s"v$i"))).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), "v", k = 64)
    val got = Sketches.kmvJaccardPairs(sk, "g", k = 64)
      .orderBy("g_a", "g_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    assert(got.toSeq == Seq(("a", "b", 5.0 / 15.0), ("a", "c", 0.0),
      ("b", "c", 0.0)), s"got ${got.toSeq}")
    // above k: 50% true overlap estimated within the sketch band
    val big = spark.range(0, 4000).select(lit("x").as("g"),
        concat(lit("u"), col("id")).as("v"))
      .union(spark.range(2000, 6000).select(lit("y").as("g"),
        concat(lit("u"), col("id")).as("v")))
    val j = Sketches.kmvJaccardPairs(
        Sketches.kmvSketch(big, Seq("g"), "v", k = 128), "g", k = 128)
      .head().getDouble(4)
    val trueJ = 2000.0 / 6000.0
    assert(math.abs(j - trueJ) < 0.2, s"estimate $j vs true $trueJ")
  }

  test("estimate lands within the analytic band on fixture shingles") {
    val grams = Tables.documents(spark, sf)
      .select(col("source"), graft.ops.TextOps.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(__t) - 3), " +
          "i -> array_join(slice(__t, i + 1, 3), ' '))")).as("gram"))
      .withColumn("g", lit("all")).drop("source")
    val exact = grams.select("gram").distinct().count()
    val est = Sketches.kmvDistinct(grams, Seq("g"), "gram", k = 256)
      .head().getDouble(2)
    // standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(exact > 256, s"fixture must exceed k, got $exact")
    assert(math.abs(est - exact) / exact < 0.25,
      s"estimate $est too far from exact $exact")
  }

  test("count-min: never underestimates, sketch size bounded, mass conserved") {
    import spark.implicits._
    val keys = Seq.tabulate(2000)(i => s"k${i % 300}") // skewed-ish corpus
    val df = keys.toDF("k")
    val depth = 4
    val width = 64 // << 300 distinct keys: collisions guaranteed
    val sk = Sketches.cmsSketch(df, "k", depth, width).persist()
    assert(sk.count() <= depth.toLong * width, "sketch must stay bounded")
    // every row of the matrix holds the full occurrence mass
    val mass = sk.groupBy("row").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1)).toSeq
    assert(mass == Seq.fill(depth)(keys.size.toLong), s"mass $mass")
    // point queries: est >= exact for EVERY key (the CMS one-sided bound)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val joined = Sketches.cmsEstimate(sk, exact.select("k"), "k", depth, width)
      .join(exact, "k").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"underestimate for ${r.getString(0)}: est ${r.getLong(1)} < ${r.getLong(2)}"))
    // an unseen key reads 0 only if all its buckets are empty; with
    // width 64 fully occupied it must still never go negative
    val unseen = Sketches.cmsEstimate(sk,
      Seq("never-seen-key").toDF("k"), "k", depth, width).head().getLong(1)
    assert(unseen >= 0L)
    sk.unpersist()
  }

  test("hdrSketch: hand-computed buckets; v<1 and NULL excluded") {
    import spark.implicits._
    // m=4: v=1 -> e0 sub0 b0; v=2 -> e1 sub0 b4; v=3 -> e1 sub2 b6;
    // v=4 -> e2 b8; v=5 -> e2 sub1 b9; v=7 -> e2 sub3 b11; v=8 -> e3 b12
    val df = Seq(Some(1L), Some(2L), Some(3L), Some(4L), Some(5L),
      Some(7L), Some(8L), Some(0L), None).toDF("v")
      .withColumn("g", lit("g"))
    val got = Sketches.hdrSketch(df, Seq("g"), "v", m = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 4L -> 1L, 6L -> 1L, 8L -> 1L, 9L -> 1L,
      11L -> 1L, 12L -> 1L), s"buckets: $got")
  }

  test("hdr merge-tree == direct build, bit-exact (the AggState property)") {
    import spark.implicits._
    val all = spark.range(1, 5000)
      .select(lit("g").as("g"), (col("id") * col("id") % 40000 + 1).as("v"))
    val parts = Seq(0, 1, 2).map(i => all.filter(col("id") % 3 === i))
    val m = 16
    val direct = Sketches.hdrSketch(all, Seq("g"), "v", m)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // tree: merge(merge(s0, s1), s2)
    val s = parts.map(p => Sketches.hdrSketch(p, Seq("g"), "v", m))
    val tree = Sketches.hdrMerge(Seq("g"),
      Sketches.hdrMerge(Seq("g"), s(0), s(1)), s(2))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(tree == direct, "merge tree must equal direct build bit-exactly")
  }

  test("hdrQuantile: relative value error <= 1/m + 1/base vs exact") {
    import spark.implicits._
    val vals = (1L to 4000L).map(i => i * i % 30011L + 1L)
    val df = vals.toDF("v").withColumn("g", lit("g"))
    val m = 32
    val sk = Sketches.hdrSketch(df, Seq("g"), "v", m).localCheckpoint()
    for ((num, den) <- Seq((1L, 2L), (9L, 10L), (99L, 100L))) {
      val est = Sketches.hdrQuantile(sk, Seq("g"), m, num, den).head()
      assert(est.getLong(1) == vals.size.toLong)
      val got = est.getLong(2)
      // exact type-1 lower quantile: smallest x with rank*den >= n*num
      val sorted = vals.sorted
      val exact = sorted(
        (math.ceil(num.toDouble * vals.size / den).toInt - 1).max(0))
      assert(got <= exact, s"q=$num/$den: lower bound $got > exact $exact")
      val relErr = (exact - got).toDouble / exact
      assert(relErr <= 1.0 / m + 0.01,
        s"q=$num/$den: est $got vs exact $exact, relErr $relErr")
    }
    // empty groupCols = one global row, same values
    val g = Sketches.hdrQuantile(sk.drop("g"), Seq.empty, m, 1L, 2L).head()
    assert(g.getLong(0) == vals.size.toLong)
  }

  test("hdrSketchSigned: identity transform reproduces hdrSketch buckets") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L).toDF("v")
      .withColumn("g", lit("g"))
    // scale=1, offsetGrid=1: shifted = v - 1 + 1 = v
    val signed = Sketches.hdrSketchSigned(df, Seq("g"), "v", 4, 1L, 1L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val plain = Sketches.hdrSketch(df, Seq("g"), "v", 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(signed == plain, s"signed $signed vs plain $plain")
  }

  test("hdrSigned: fractional+negative values — merge-tree bit-exact, " +
    "quantile rational is a lower bound within the band") {
    import spark.implicits._
    // signed fractional values in [-200.0, 200.0) at 10^-3 grain
    val vals = (1 to 4000).map(i => ((i * i) % 4000 - 2000) / 10.0)
    val df = vals.toDF("v").withColumn("g", lit("g"))
    val m = 32
    val scale = 1000L
    val off = -2000000L // floor(-200.0 * 1000)
    val direct = Sketches.hdrSketchSigned(df, Seq("g"), "v", m, scale, off)
    val parts = Seq(0, 1, 2).map(i =>
      df.withColumn("__i", monotonically_increasing_id())
        .filter(col("__i") % 3 === i).drop("__i"))
    val tree = Sketches.hdrMergeSigned(Seq("g"),
      Sketches.hdrMergeSigned(Seq("g"),
        Sketches.hdrSketchSigned(parts(0), Seq("g"), "v", m, scale, off),
        Sketches.hdrSketchSigned(parts(1), Seq("g"), "v", m, scale, off)),
      Sketches.hdrSketchSigned(parts(2), Seq("g"), "v", m, scale, off))
    val dSet = direct.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val tSet = tree.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(tSet == dSet, "signed merge tree must equal direct build")
    val sk = direct.localCheckpoint()
    for ((num, den) <- Seq((1L, 2L), (9L, 10L))) {
      val est = Sketches.hdrQuantileSigned(sk, Seq("g"), m, num, den).head()
      assert(est.getLong(1) == vals.size.toLong)
      val rational = est.getLong(2).toDouble / est.getLong(3)
      val sorted = vals.sorted
      val exact = sorted(
        (math.ceil(num.toDouble * vals.size / den).toInt - 1).max(0))
      // lower bound within 1/m relative error ON THE SHIFTED GRID
      assert(rational <= exact + 1e-9,
        s"q=$num/$den: $rational not a lower bound of $exact")
      val shiftedExact = math.floor(exact * scale) - off + 1
      val relErr = (shiftedExact - (est.getLong(2) - off + 1)) / shiftedExact
      assert(relErr <= 1.0 / m + 0.01,
        s"q=$num/$den: $rational vs $exact, shifted relErr $relErr")
    }
    sk.unpersist()
  }

  test("hdrMergeSigned refuses a meta mismatch loudly") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).toDF("v").withColumn("g", lit("g"))
    val a = Sketches.hdrSketchSigned(df, Seq("g"), "v", 8, 10L, -100L)
    val b = Sketches.hdrSketchSigned(df, Seq("g"), "v", 8, 100L, -100L)
    val e = intercept[IllegalArgumentException] {
      Sketches.hdrMergeSigned(Seq("g"), a, b)
    }
    assert(e.getMessage.contains("affine meta"), e.getMessage)
  }

  test("hdrSketchSigned raises in-plan on a value below the declared bound") {
    import spark.implicits._
    val df = Seq(-5.0, 1.0).toDF("v").withColumn("g", lit("g"))
    // declared bound -2 on the grid, but floor(-5.0*1) = -5 < -2
    val e = intercept[Exception] {
      Sketches.hdrSketchSigned(df, Seq("g"), "v", 8, 1L, -2L).collect()
    }
    assert(e.getMessage != null)
  }

  test("hdrSigned: NaN raises instead of gridding as offset; " +
    "mixed-meta quantile read refuses") {
    import spark.implicits._
    // NaN would floor->cast to 0 and silently grid as value offset/scale
    val nan = Seq(1.0, Double.NaN).toDF("v").withColumn("g", lit("g"))
    val e1 = intercept[Exception] {
      Sketches.hdrSketchSigned(nan, Seq("g"), "v", 8, 1L, -2L).collect()
    }
    assert(e1.getMessage != null)
    // a hand-unioned mixed-meta frame must be refused at read time too
    val df = Seq(1.0, 2.0).toDF("v").withColumn("g", lit("g"))
    val mixed = Sketches.hdrSketchSigned(df, Seq("g"), "v", 8, 10L, -100L)
      .unionByName(
        Sketches.hdrSketchSigned(df, Seq("g"), "v", 8, 100L, -100L))
    val e2 = intercept[IllegalArgumentException] {
      Sketches.hdrQuantileSigned(mixed, Seq("g"), 8)
    }
    assert(e2.getMessage.contains("mixed affine meta"), e2.getMessage)
  }

  test("hdrSketchWeighted(pre-agg) == hdrSketch(raw rows) bit-exact; " +
    "bad weights raise") {
    import spark.implicits._
    val m = 16
    val raw = (1L to 2000L).map(i => ("g", i * i % 700L + 1L))
    val pre = raw.groupBy(identity).map { case ((g, v), rs) =>
      (g, v, rs.size.toLong) }.toSeq
    val a = Sketches.hdrSketch(raw.toDF("g", "v"), Seq("g"), "v", m)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = Sketches.hdrSketchWeighted(pre.toDF("g", "v", "w"),
        Seq("g"), "v", "w", m)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a == b, s"weighted $b != raw $a")
    val e = intercept[Exception] {
      Sketches.hdrSketchWeighted(Seq(("g", 5L, 0L)).toDF("g", "v", "w"),
        Seq("g"), "v", "w", m).collect()
    }
    assert(e.getMessage != null)
    // fractional weight must RAISE, not silently truncate 2.7 -> 2
    // (that would drop mass — the one thing the docstring forbids)
    val ef = intercept[Exception] {
      Sketches.hdrSketchWeighted(Seq(("g", 5L, 2.7)).toDF("g", "v", "w"),
        Seq("g"), "v", "w", m).collect()
    }
    assert(ef.getMessage != null)
    // integral DOUBLE weight is fine (lossless cast)
    val ok = Sketches.hdrSketchWeighted(
      Seq(("g", 5L, 3.0)).toDF("g", "v", "w"), Seq("g"), "v", "w", m)
      .collect()
    assert(ok.map(_.getLong(2)).sum == 3L, ok.mkString(","))
  }

  test("hdrPsiGate: identical sketches read exactly 0; planted shift " +
    "alerts; merged-state gate == direct-build gate; empty side raises") {
    import spark.implicits._
    val m = 16
    val xs = (1L to 3000L).map(i => i * i % 9000L + 1L)
    val sk = Sketches.hdrSketch(xs.toDF("v"), Seq.empty, "v", m)
      .localCheckpoint()
    val same = Sketches.hdrPsiGate(sk, sk).head()
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0 &&
      !same.getBoolean(5), s"identical sketches must read 0: $same")
    // planted shift: values 4x larger on side B -> strong alert; JS
    // bounded by ln 2
    val shifted = Sketches.hdrSketch(xs.map(v => v * 4L).toDF("v"),
      Seq.empty, "v", m)
    val drift = Sketches.hdrPsiGate(sk, shifted).head()
    assert(drift.getDouble(3) > 0.25 && drift.getBoolean(5),
      s"4x shift must alert: $drift")
    assert(drift.getDouble(4) > 0.0 && drift.getDouble(4) < math.log(2.0),
      s"JS must be in (0, ln2): $drift")
    // state-plane contract: gate over MERGED per-day sketches equals
    // the gate over a direct build of the union
    val d1 = xs.take(1500); val d2 = xs.drop(1500)
    val merged = Sketches.hdrMerge(Seq.empty,
      Sketches.hdrSketch(d1.toDF("v"), Seq.empty, "v", m),
      Sketches.hdrSketch(d2.toDF("v"), Seq.empty, "v", m))
    val gm = Sketches.hdrPsiGate(merged, shifted).head()
    assert(gm.getDouble(3) == drift.getDouble(3) &&
      gm.getDouble(4) == drift.getDouble(4),
      s"merged-state gate $gm != direct $drift")
    val e = intercept[Exception] {
      Sketches.hdrPsiGate(sk, sk.filter(lit(false))).collect()
    }
    assert(e.getMessage != null)
  }

  test("hdrEmdGate: identical sketches read exactly 0; two point masses " +
    "read exactly their value distance; merged == direct; empty raises") {
    import spark.implicits._
    val m = 16
    val xs = (1L to 3000L).map(i => i * i % 9000L + 1L)
    val sk = Sketches.hdrSketch(xs.toDF("v"), Seq.empty, "v", m)
      .localCheckpoint()
    val same = Sketches.hdrEmdGate(sk, sk, m).head()
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0,
      s"identical sketches must read W1=0: $same")
    // point masses at 100 and 200: both are exact bucket lower bounds
    // at m=16, so W1 == 100 and the span-normalized score == 1
    val pa = Sketches.hdrSketch(Seq.fill(10)(100L).toDF("v"),
      Seq.empty, "v", m)
    val pb = Sketches.hdrSketch(Seq.fill(7)(200L).toDF("v"),
      Seq.empty, "v", m)
    val pm = Sketches.hdrEmdGate(pa, pb, m).head()
    assert(pm.getDouble(3) == 100.0 && pm.getDouble(4) == 1.0,
      s"point masses must read exact transport: $pm")
    // state-plane contract: gate over MERGED per-day sketches == direct
    val d1 = xs.take(1500); val d2 = xs.drop(1500)
    val merged = Sketches.hdrMerge(Seq.empty,
      Sketches.hdrSketch(d1.toDF("v"), Seq.empty, "v", m),
      Sketches.hdrSketch(d2.toDF("v"), Seq.empty, "v", m))
    val shifted = Sketches.hdrSketch(xs.map(_ * 2L).toDF("v"),
      Seq.empty, "v", m)
    val gm = Sketches.hdrEmdGate(merged, shifted, m).head()
    val gd = Sketches.hdrEmdGate(sk, shifted, m).head()
    assert(gm.getDouble(3) == gd.getDouble(3) &&
      gm.getDouble(4) == gd.getDouble(4),
      s"merged-state gate $gm != direct $gd")
    assert(gd.getDouble(3) > 0.0, s"2x shift must move mass: $gd")
    val e = intercept[Exception] {
      Sketches.hdrEmdGate(sk, sk.filter(lit(false)), m).collect()
    }
    assert(e.getMessage != null)
  }

  test("hdrEmdGate: counts whose exact numerator would overflow " +
    "DECIMAL(38,0) raise loudly instead of silently dropping mass") {
    import spark.implicits._
    // n_a = n_b = 9e18 -> log10(na)+log10(nb) = 37.9+ even at span 1;
    // without the guard the per-bucket decimal product goes NULL and
    // sum() skips it (understated emd, no error)
    val big = Seq((10L, 9000000000000000000L)).toDF("bucket", "cnt")
    val e = intercept[Exception] {
      Sketches.hdrEmdGate(big, big, 16).collect()
    }
    assert(e.getMessage.contains("headroom"), e.getMessage)
    // same shape with sane counts still reads 0 (identical sketches)
    val ok = Seq((10L, 1000000L)).toDF("bucket", "cnt")
    assert(Sketches.hdrEmdGate(ok, ok, 16).head().getDouble(3) == 0.0)
  }

  // --- top-k heavy-hitters summary ----------------------------------------

  private def topkState(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.getString(0)).getOrElse("<meta>"),
      r.getLong(1), r.getLong(2))).toSet

  test("topkSketch: hand-computed leaf state, thresholds, meta") {
    import spark.implicits._
    // one leaf, k=2: counts a:4 b:3 c:2 d:1 -> keep a,b; t = c's count 2;
    // meta N=10 T=2
    val df = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("item0")
    val sk = Sketches.topkSketch(df, Seq.empty, "item0", k = 2)
      .select("item", "cnt", "tseen")
    assert(topkState(sk) == Set(("a", 4L, 2L), ("b", 3L, 2L),
      ("<meta>", 10L, 2L)), topkState(sk))
    // nothing dropped -> threshold 0
    val sk4 = Sketches.topkSketch(df, Seq.empty, "item0", k = 4)
      .select("item", "cnt", "tseen")
    assert(topkState(sk4) == Set(("a", 4L, 0L), ("b", 3L, 0L),
      ("c", 2L, 0L), ("d", 1L, 0L), ("<meta>", 10L, 0L)), topkState(sk4))
  }

  test("topkSketch: merge-tree == flat merge == leaf-split build, " +
    "bit-identical; bounds sound vs exact counts") {
    import spark.implicits._
    val k = 8
    // three skewed leaves with different hot items per leaf
    def leaf(seed: Int, hot: String): Seq[(String, String)] =
      (1 to 900).map { i =>
        val z = (seed * 7919 + i * i) % 100
        val it = if (z < 40) hot else if (z < 70) s"w${z % 12}"
          else s"rare${(seed * 1000 + i) % 300}"
        (s"d$seed", it)
      }
    val l1 = leaf(1, "alpha"); val l2 = leaf(2, "beta"); val l3 = leaf(3, "alpha")
    val all = (l1 ++ l2 ++ l3).toDF("day", "w")
    val sA = Sketches.topkSketch(l1.toDF("day", "w"), Seq.empty, "w", k)
    val sB = Sketches.topkSketch(l2.toDF("day", "w"), Seq.empty, "w", k)
    val sC = Sketches.topkSketch(l3.toDF("day", "w"), Seq.empty, "w", k)
    val t1 = Sketches.topkMerge(Seq.empty,
      Sketches.topkMerge(Seq.empty, sA, sB), sC)
    val t2 = Sketches.topkMerge(Seq.empty, sA,
      Sketches.topkMerge(Seq.empty, sB, sC))
    val flat = Sketches.topkMerge(Seq.empty, sA, sB, sC)
    val split = Sketches.topkSketch(all, Seq.empty, "w", k,
      leafCols = Seq("day"))
    val ref = topkState(flat.select("item", "cnt", "tseen"))
    assert(topkState(t1.select("item", "cnt", "tseen")) == ref, "tree1")
    assert(topkState(t2.select("item", "cnt", "tseen")) == ref, "tree2")
    assert(topkState(split.select("item", "cnt", "tseen")) == ref, "split")
    // bounds: lb <= true <= ub for every reported item; absent <= T
    val exact = all.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = Sketches.topkHeavyHitters(flat, Seq.empty, k).collect()
    assert(hh.nonEmpty)
    var absentBound = 0L
    val reported = hh.map { r =>
      val (item, lb, ub) = (r.getString(1), r.getLong(2), r.getLong(3))
      val c = exact(item)
      assert(lb <= c && c <= ub, s"$item: true $c outside [$lb,$ub]")
      absentBound = r.getLong(5)
      item
    }.toSet
    val stateItems = flat.filter(col("item").isNotNull)
      .collect().map(_.getString(0)).toSet
    exact.foreach { case (it, c) =>
      if (!stateItems.contains(it))
        assert(c <= absentBound, s"absent $it count $c > bound $absentBound")
    }
    // the true #1 item must be reported (its count dwarfs every bound)
    val trueTop = exact.maxBy { case (i, c) => (c, i) }._1
    assert(reported.contains(trueTop), s"true top $trueTop not reported")
  }

  test("topkSketch grouped + topkCompact keeps both guarantees") {
    import spark.implicits._
    val k = 4
    val rows = (1 to 2000).map { i =>
      val g = if (i % 2 == 0) "g1" else "g2"
      val z = (i * i) % 50
      val it = if (z < 20) s"hot${z % 3}" else s"cold${i % 97}"
      (g, if (i % 5 == 0) "d1" else "d2", it)
    }
    val df = rows.toDF("g", "day", "w")
    val sk = Sketches.topkSketch(df, Seq("g"), "w", k, leafCols = Seq("day"))
    val compact = Sketches.topkCompact(sk, Seq("g"), 2)
    // compaction: <= 2 item rows + 1 meta row per group
    val perG = compact.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perG.values.forall(_ <= 3), perG.toString)
    val exact = df.groupBy("g", "w").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val hh = Sketches.topkHeavyHitters(compact, Seq("g"), 2).collect()
    val bounds = scala.collection.mutable.Map.empty[String, Long]
    val present = hh.map { r =>
      val (g, item, lb, ub) = (r.getString(0), r.getString(2),
        r.getLong(3), r.getLong(4))
      val c = exact((g, item))
      assert(lb <= c && c <= ub, s"($g,$item): true $c outside [$lb,$ub]")
      bounds(g) = r.getLong(6)
      (g, item)
    }.toSet
    val stateItems = compact.filter(col("item").isNotNull)
      .select("g", "item").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    exact.foreach { case ((g, it), c) =>
      if (!stateItems.contains((g, it)))
        assert(c <= bounds(g), s"absent ($g,$it) count $c > T ${bounds(g)}")
    }
    assert(present.nonEmpty)
  }

  test("topkShift: entered/left/stayed with honest bounds from both " +
    "sides; absent-from-state items fall back to [0, T]; empty side raises") {
    import spark.implicits._
    // side A: a:5 b:4 c:3 d:2 (k=2 keeps a,b; t = c's 3)
    // side B: c:6 a:4 x:1     (k=2 keeps c,a; t = x's 1)
    val bagA = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d")
    val bagB = Seq.fill(6)("c") ++ Seq.fill(4)("a") ++ Seq("x")
    val sa = Sketches.topkSketch(bagA.toDF("w"), Seq.empty, "w", 2)
    val sb = Sketches.topkSketch(bagB.toDF("w"), Seq.empty, "w", 2)
    val got = Sketches.topkShift(sa, sb, Seq.empty, 2).collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.toString.toInt),
        Option(r.get(3)).map(_.toString.toInt),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // a: rank 1 in A (lb 5 ub 5+3-3=5), rank 2 in B (lb 4 ub 4)
    assert(got("a") == (("stayed", Some(1), Some(2), 5L, 5L, 4L, 4L)),
      got("a").toString)
    // b: left — in A's top-k (lb 4), absent from B's STATE -> [0, t_b=1]
    assert(got("b") == (("left", Some(2), None, 4L, 4L, 0L, 1L)),
      got("b").toString)
    // c: entered — absent from A's top-k but IN A's state? no: k=2 kept
    // a,b only, c is A's threshold item (dropped) -> [0, t_a=3]
    assert(got("c") == (("entered", None, Some(1), 0L, 3L, 6L, 6L)),
      got("c").toString)
    assert(got.keySet == Set("a", "b", "c"), got.keySet.toString)
    // empty side raises the named contract error
    val e = intercept[Exception] {
      Sketches.topkShift(sa, sb.filter(lit(false)), Seq.empty, 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("topkRegisters/topkFromRegisters round-trip bit-exactly") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g" + (i % 2), "w" + (i * i % 23)))
      .toDF("g", "w")
    val sk = Sketches.topkSketch(df, Seq("g"), "w", 5)
    val back = Sketches.topkFromRegisters(
      Sketches.topkRegisters(sk, Seq("g")).withColumnRenamed("v", "sum_v"),
      Seq("g"))
    def st(d: org.apache.spark.sql.DataFrame) = d.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSet
    assert(st(sk.select("g", "item", "cnt", "tseen")) ==
      st(back.select("g", "item", "cnt", "tseen")))
  }

  test("hdrKsGate: identical sketches give D=0; disjoint reject; " +
    "merged-state gate == direct-build gate; empty side raises") {
    import spark.implicits._
    val m = 16
    val xs = (1L to 3000L).map(i => i * i % 9000L + 1L)
    val df = xs.toDF("v")
    val sk = Sketches.hdrSketch(df, Seq.empty, "v", m).localCheckpoint()
    val same = Sketches.hdrKsGate(sk, sk).head()
    assert(same.getDouble(3) == 0.0 && !same.getBoolean(5),
      s"identical sketches must read D=0: $same")
    // disjoint supports: D = 1 exactly (cumA saturates before cumB starts)
    val lo = Sketches.hdrSketch((1L to 500L).toDF("v"), Seq.empty, "v", m)
    val hi = Sketches.hdrSketch((1000000L to 1000500L).toDF("v"),
      Seq.empty, "v", m)
    val dj = Sketches.hdrKsGate(lo, hi).head()
    assert(dj.getDouble(3) == 1.0 && dj.getBoolean(5), s"disjoint: $dj")
    // gating MERGED state == gating a direct build (the drift use-case:
    // yesterday's sketch + today's increment, never a re-scan)
    val parts = Seq(0, 1).map(i =>
      df.withColumn("__i", monotonically_increasing_id())
        .filter(col("__i") % 2 === i).drop("__i"))
    val merged = Sketches.hdrMerge(Seq.empty,
      Sketches.hdrSketch(parts(0), Seq.empty, "v", m),
      Sketches.hdrSketch(parts(1), Seq.empty, "v", m))
    val other = Sketches.hdrSketch(
      xs.map(x => x / 2 + 1).toDF("v"), Seq.empty, "v", m)
      .localCheckpoint()
    val gm = Sketches.hdrKsGate(merged, other).head()
    val gd = Sketches.hdrKsGate(sk, other).head()
    assert(gm.getDouble(3) == gd.getDouble(3) &&
      gm.getLong(0) == gd.getLong(0), s"merged $gm != direct $gd")
    // an empty side is a contract error, not a NaN verdict
    val e = intercept[Exception] {
      Sketches.hdrKsGate(sk, sk.limit(0)).collect()
    }
    assert(e.getMessage != null)
    sk.unpersist(); other.unpersist()
  }

  test("hll: merge-tree == direct build bit-exact; estimate within the analytic band; duplicates free") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).map(i => ("g", s"user_$i")).toDF("g", "v")
    val direct = Sketches.hllSketch(df, Seq("g"), "v", p = 9)
    // split in thirds, sketch each, merge — must equal direct bit-exactly
    val parts = (0 until 3).map(j => Sketches.hllSketch(
      df.filter(col("v").substr(lit(6), lit(9)).cast("int") % 3 === j),
      Seq("g"), "v", p = 9))
    val merged = Sketches.hllMerge(Seq("g"), parts: _*)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0,
      "hllMerge must equal the direct build register-for-register")
    // estimate within ~3 standard errors (1.04/sqrt(512) ≈ 4.6%)
    val est = Sketches.hllEstimate(direct, Seq("g"), p = 9).head()
    assert(math.abs(est.getDouble(2) / n - 1.0) < 0.15,
      s"estimate ${est.getDouble(2)} vs $n")
    // duplicate rows change nothing (register MAX is idempotent)
    val dup = Sketches.hllSketch(df.unionAll(df), Seq("g"), "v", p = 9)
    assert(dup.exceptAll(direct).count() == 0)
    // small cardinality routes through linear counting and lands close
    val small = (1 to 40).map(i => ("g", s"u$i")).toDF("g", "v")
    val se = Sketches.hllDistinct(small, Seq("g"), "v", p = 9).head()
    assert(math.abs(se.getDouble(2) - 40.0) < 5.0,
      s"linear-counting estimate ${se.getDouble(2)} vs 40")
    intercept[IllegalArgumentException] {
      Sketches.hllSketch(df, Seq("g"), "v", p = 3)
    }
  }

  test("hllOverlap: identity reads J=1; disjoint reads near 0; " +
    "half overlap lands in the band; empty side raises") {
    import spark.implicits._
    val p = 9
    def sk(lo: Int, hi: Int) = Sketches.hllSketch(
      (lo until hi).map(i => s"u$i").toDF("v")
        .withColumn("g", lit("g")).drop("g"),
      Seq.empty, "v", p)
    val a = sk(0, 4000).localCheckpoint()
    val idem = Sketches.hllOverlap(a, a, p).head()
    assert(idem.getDouble(4) == 1.0 &&
      idem.getDouble(3) == idem.getDouble(0),
      s"self-overlap must be exact identity: $idem")
    // disjoint: intersection estimate noise only
    val dj = Sketches.hllOverlap(a, sk(10000, 14000), p).head()
    assert(dj.getDouble(4) < 0.12, s"disjoint jaccard: $dj")
    // half overlap: |A|=|B|=4000, |A∩B|=2000 -> J = 1/3; three
    // compounded p=9 estimates -> generous band
    val half = Sketches.hllOverlap(a, sk(2000, 6000), p).head()
    assert(half.getDouble(4) > 0.18 && half.getDouble(4) < 0.5,
      s"half-overlap jaccard: $half")
    val e = intercept[Exception] {
      Sketches.hllOverlap(a, a.limit(0), p).collect()
    }
    assert(e.getMessage != null)
    a.unpersist()
  }

  test("ams: merge == direct bit-exact; estimate brackets exact F2; layout-invariant") {
    import spark.implicits._
    // zipf-ish multiset: value i appears 200/i times — heavy F2 skew
    val rows = (1 to 200).flatMap(i => Seq.fill(200 / i)(("g", s"v$i")))
    val df = rows.toDF("g", "v")
    val direct = Sketches.amsSketch(df, Seq("g"), "v", counters = 63)
    // register count = counters exactly
    assert(direct.count() == 63)
    // disjoint thirds sketch-then-merge == direct (registers are sums)
    val parts = (0 until 3).map(j => Sketches.amsSketch(
      df.withColumn("__i", monotonically_increasing_id())
        .filter(pmod(col("__i"), lit(3)) === j).drop("__i"),
      Seq("g"), "v", counters = 63))
    val merged = Sketches.amsMerge(Seq("g"), parts: _*)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0,
      "amsMerge must equal the direct build register-for-register")
    // estimate: median-of-63 lands within a generous multiplicative band
    val f2Exact = rows.groupBy(identity).map { case (_, g) =>
      g.size.toLong * g.size }.sum.toDouble
    val est = Sketches.amsEstimate(direct, Seq("g"), counters = 63)
      .head().getDouble(1)
    assert(est > f2Exact / 4 && est < f2Exact * 4,
      s"AMS estimate $est vs exact F2 $f2Exact")
    // layout invariance: a repartitioned input gives identical registers
    val re = Sketches.amsSketch(df.repartition(7), Seq("g"), "v", 63)
    assert(re.exceptAll(direct).count() == 0)
    intercept[IllegalArgumentException] {
      Sketches.amsSketch(df, Seq("g"), "v", counters = 10)
    }
  }
}
