package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Retrieval, Similarity, TextOps}

/** Greedy k-center selection and RRF hybrid retrieval: each certified
  * against an independent driver-side reimplementation with the SAME
  * determinism spellings (6-dp rounded cosines, id tie-breaks, scaled
  * integer RRF terms), plus plan-shape checks for the scale claims.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // left-to-right double accumulation — the engine's dot-product order
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos6(a: Array[Double], b: Array[Double]): Double =
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  /** Reference greedy k-center with identical spellings. */
  private def naiveKCenter(vecs: Seq[(Long, Array[Double])],
                           k: Int): Seq[(Int, Long, Option[Double])] = {
    val seed = vecs.minBy(_._1)
    var picked = Vector((1, seed._1, Option.empty[Double]))
    var cmax = vecs.map { case (id, v) => id -> cos6(v, seed._2) }.toMap
    val byId = vecs.toMap
    while (picked.size < k && picked.size < vecs.size) {
      val remaining = vecs.filterNot(v => picked.exists(_._2 == v._1))
      val (nid, ncm) = remaining.map(v => (v._1, cmax(v._1)))
        .minBy { case (id, c) => (c, id) }
      picked :+= ((picked.size + 1, nid, Some(ncm)))
      cmax = cmax.map { case (id, c) =>
        id -> math.max(c, cos6(byId(id), byId(nid)))
      }
    }
    picked
  }

  private def fixtureVecs(n: Int): Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).filter(col("vec_id") < n)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

  test("kCenterSelect replays the naive greedy trajectory exactly") {
    val n = 40; val k = 8
    val got = Similarity.kCenterSelect(
      Tables.embeddings(spark, sf).filter(col("vec_id") < n),
      "vec_id", "embedding", k)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(got == naiveKCenter(fixtureVecs(n), k))
  }

  test("kCenterSelect: seed is lowest id; nearest_cos non-decreasing; ids distinct") {
    val got = Similarity.kCenterSelect(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 6)
      .orderBy("round").collect()
    assert(got.length == 6)
    assert(got.head.getLong(1) == 0L) // fixture min vec_id
    assert(got.head.isNullAt(2))
    val cs = got.tail.map(_.getDouble(2)).toSeq
    // covering cosine grows as centers accumulate (max-min contraction)
    assert(cs == cs.sorted, s"nearest_cos not monotone: $cs")
    assert(got.map(_.getLong(1)).distinct.length == 6)
  }

  test("kCenterSelect excludes zero-norm vectors instead of crashing") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), // zero vector: no defined cosine — excluded
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(df, "vec_id", "embedding", 3)
      .orderBy("round").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L),
      "seed must be the lowest NONZERO id and the zero vector never selected")
  }

  test("kCenterSelect caps at corpus size when k exceeds it") {
    val got = Similarity.kCenterSelect(
      Tables.embeddings(spark, sf).filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 10)
    assert(got.count() == 3)
  }

  test("kCenterSelect at k=500: bounded plan growth, exact trajectory") {
    // the round-11 watch item: the old NOT-IN literal grew O(k) per round
    // (O(k²) plan bytes) — the __sel flag fold plus 16-round
    // localCheckpoint truncation must keep every round's plan bounded,
    // and still replay the naive greedy trajectory EXACTLY at large k
    val n = 520; val k = 500
    val got = Similarity.kCenterSelect(
      Tables.embeddings(spark, sf).filter(col("vec_id") < n),
      "vec_id", "embedding", k)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(got.size == k)
    assert(got.map(_._2).distinct.size == k)
    assert(got == naiveKCenter(fixtureVecs(n), k))
  }

  test("kCenterSelect sampleFraction pre-samples deterministically") {
    val emb = Tables.embeddings(spark, sf)
    def run() = Similarity.kCenterSelect(emb, "vec_id", "embedding", 5,
      sampleFraction = Some(0.5))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = run()
    assert(a.size == 5)
    assert(a == run(), "fixed-seed sampling must make the selection stable")
    // the sampled universe is a strict subset: still seeded at its min id
    assert(a.head._1 == 1)
  }

  test("hybridRrf matches a driver-side fusion of its two certified rankings") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val terms = Seq("spark", "query", "filter")
    val topN = 20; val rrfK = 60; val qid = 7L

    val lexRanks = TextOps.bm25Scores(docs, "doc_id", "text", terms)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(topN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val qv = vecs.find(_._1 == qid).get._2
    val embRanks = vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cos6(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(topN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    val expected = (lexRanks.keySet ++ embRanks.keySet).toSeq.map { id =>
      val t1 = lexRanks.get(id).map(r => 1000000000000L / (rrfK + r)).getOrElse(0L)
      val t2 = embRanks.get(id).map(r => 1000000000000L / (rrfK + r)).getOrElse(0L)
      (id, lexRanks.get(id), embRanks.get(id), t1 + t2)
    }.sortBy { case (id, _, _, s) => (-s, id) }

    val got = Retrieval.hybridRrf(docs, "doc_id", "text", terms,
      emb, "vec_id", "embedding", qid, topN, rrfK)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("hybridRrf plan: both rankings reduce via TakeOrderedAndProject") {
    val plan = Retrieval.hybridRrf(
      Tables.documents(spark, sf), "doc_id", "text", Seq("spark"),
      Tables.embeddings(spark, sf), "vec_id", "embedding", 7L, 50, 60)
      .queryExecution.executedPlan.toString
    val topK = "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(topK >= 2, s"expected both rankings as top-k, got $topK\n$plan")
  }

  test("ndcgAtK: hand DCG/IDCG values, perfect ranking, no-relevant NULL") {
    import spark.implicits._
    def run(rows: (String, String, Double, Long)*) =
      graft.ops.Retrieval.ndcgAtK(
        rows.toSeq.toDF("q", "doc", "score", "rel"),
        "q", "doc", "score", "rel", k = 10).orderBy("q").collect()
    // system ranks the WORST doc first: d3(rel0), d2(rel1), d1(rel2)
    val bad = run(("a", "d1", 0.1, 2L), ("a", "d2", 0.5, 1L),
      ("a", "d3", 0.9, 0L)).head
    val dcgExp = 1.0 / (math.log(3) / math.log(2)) + 3.0 / 2.0
    val idcgExp = 3.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(bad.getDouble(1) - dcgExp) < 1e-9, s"dcg ${bad.getDouble(1)}")
    assert(math.abs(bad.getDouble(2) - idcgExp) < 1e-9)
    assert(math.abs(bad.getDouble(3) - dcgExp / idcgExp) < 1e-9)
    // perfect ranking scores exactly 1
    val good = run(("a", "d1", 0.9, 2L), ("a", "d2", 0.5, 1L),
      ("a", "d3", 0.1, 0L)).head
    assert(good.getDouble(3) == 1.0)
    // a query with no relevant docs has IDCG 0 -> NDCG undefined
    val none = run(("a", "d1", 0.9, 0L), ("a", "d2", 0.5, 0L)).head
    assert(none.getDouble(2) == 0.0 && none.isNullAt(3))
  }

  test("mmrSelect: diversity beats redundant relevance; λ=1 is pure relevance") {
    import spark.implicits._
    // b is an exact duplicate direction of a with slightly lower
    // relevance; c is orthogonal with much lower relevance.
    val cands = Seq(
      ("q1", "a", 1.0, Seq(1.0, 0.0)),
      ("q1", "b", 0.98, Seq(1.0, 0.0)),
      ("q1", "c", 0.5, Seq(0.0, 1.0)))
      .toDF("query", "id", "rel", "vec")
    def run(k: Int, lNum: Int = 1, lDen: Int = 2) =
      graft.ops.Retrieval.mmrSelect(cands, "query", "id", "rel", "vec",
        k, lNum, lDen).collect()
        .map(r => (r.getInt(1), r.getString(2), r.getDouble(3)))
        .sortBy(_._1)
    // λ=1/2: round 1 picks a (0.5); round 2: b scores 0.49−0.5 = −0.01,
    // c scores 0.25 → c wins despite half the relevance; round 3: b.
    val m3 = run(3)
    assert(m3.map(_._2).toSeq == Seq("a", "c", "b"), s"picks: ${m3.toSeq}")
    assert(m3(0)._3 == 0.5 && m3(1)._3 == 0.25 && m3(2)._3 == -0.01)
    // λ=1: pure relevance order a, b, c
    assert(run(3, 1, 1).map(_._2).toSeq == Seq("a", "b", "c"))
    // k beyond the candidate count: emits what exists
    assert(run(5).length == 3)
    assert(scala.util.Try(graft.ops.Retrieval.mmrSelect(cands, "query",
      "id", "rel", "vec", k = 0)).isFailure)
  }
}
