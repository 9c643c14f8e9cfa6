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
}
