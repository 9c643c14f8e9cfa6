package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hashBucket is deterministic, uniform-ish, and repartition-stable") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val b1 = ids.select(col("id"), Curation.hashBucket(col("id"), 100).as("b"))
    val b2 = ids.repartition(13).select(col("id"), Curation.hashBucket(col("id"), 100).as("b"))
    assert(b1.except(b2).isEmpty && b2.except(b1).isEmpty)
    // all buckets in range; occupancy roughly uniform (no bucket > 3x mean)
    val counts = b1.groupBy("b").count().collect()
    assert(counts.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 100))
    assert(counts.map(_.getLong(1)).max < 60) // mean 20, binomial tail
    // known value: md5("123") starts 202cb962 = 539801954
    val v = Seq(123L).toDF("id")
      .select(Curation.hashBucket(col("id"), 10000)).head().getLong(0)
    assert(v == 539801954L % 10000)
  }

  test("assignSplit covers all rows with correct thresholds and ratios") {
    import spark.implicits._
    val ids = (1L to 5000L).toDF("doc_id")
    val split = Curation.assignSplit(ids, "doc_id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 5000L)
    // 80/10/10 within sampling tolerance
    assert(counts("train") > 3800 && counts("train") < 4200)
    assert(counts("val") > 350 && counts("val") < 650)
    assert(counts("test") > 350 && counts("test") < 650)
    // adding rows never reassigns existing ids
    val bigger = Curation.assignSplit((1L to 6000L).toDF("doc_id"), "doc_id")
      .filter(col("doc_id") <= 5000)
    assert(split.except(bigger).isEmpty && bigger.except(split).isEmpty)
  }

  test("deterministicSample fraction is honored and nested samples are subsets") {
    import spark.implicits._
    val ids = (1L to 5000L).toDF("doc_id")
    val s10 = Curation.deterministicSample(ids, "doc_id", 0.1)
    val s50 = Curation.deterministicSample(ids, "doc_id", 0.5)
    val n10 = s10.count(); val n50 = s50.count()
    assert(n10 > 350 && n10 < 650 && n50 > 2300 && n50 < 2700)
    // bucket < t is monotone in t: the 10% sample is inside the 50% sample
    assert(s10.except(s50).isEmpty)
    assert(Curation.deterministicSample(ids, "doc_id", 0.0).isEmpty)
    assert(Curation.deterministicSample(ids, "doc_id", 1.0).count() == 5000L)
  }

  test("packingStats: exact integer arithmetic on a hand-computed corpus") {
    import spark.implicits._
    // seqLen 10; group g: docs of 4, 8, 5, 3 tokens → cum 4, 12, 17, 20
    //   doc2 spans [4,12) → crosses 10 → split; doc3 [12,17) no; doc4 [17,20) no
    //   sequences = ceil(20/10) = 2
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "g", mk(4)), (2L, "g", mk(8)), (3L, "g", mk(5)), (4L, "g", mk(3)),
      (5L, "h", mk(25)), // single doc spanning 3 sequences: crosses 10 and 20
      (6L, "i", ""))     // empty doc: 0 tokens, 0 sequences, never "split"
      .toDF("doc_id", "source", "text")
    val got = Curation.packingStats(docs, "doc_id", "text", "source", 10)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("g", 4L, 20L, 2L, 1L),
      ("h", 1L, 25L, 3L, 1L),
      ("i", 1L, 0L, 0L, 0L)))
  }

  test("tfidfTopTerms: hand-computed scores, k cutoff, deterministic ties") {
    import spark.implicits._
    import graft.ops.TextOps
    // 4 docs; "rare" appears in 1 doc (idf=ln 4), "both" in 2 (ln 2),
    // "all" in every doc (idf=0)
    val docs = Seq(
      (1L, "rare both all"),
      (2L, "both all common common"),
      (3L, "all common zeta"),
      (4L, "all common zeta")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val ln = (x: Double) => math.log(x)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // df: rare=1, both=2, common=3, zeta=2, all=4 (idf ln(4/df); all → 0)
    // doc1: rare=ln4 > both=ln2 > all=0          → {both, rare}
    // doc2: both=ln2 > common=2·ln(4/3) > all=0  → {both, common}
    // doc3/4: zeta=ln2 > common=ln(4/3) > all=0  → {common, zeta}
    assert(got.toSeq == Seq(
      (1L, "both", r6(ln(2))), (1L, "rare", r6(ln(4))),
      (2L, "both", r6(ln(2))), (2L, "common", r6(2 * ln(4.0 / 3))),
      (3L, "common", r6(ln(4.0 / 3))), (3L, "zeta", r6(ln(2))),
      (4L, "common", r6(ln(4.0 / 3))), (4L, "zeta", r6(ln(2)))))
  }

  test("contiguousIds: dense 0..n-1, key-ordered, invariant to input layout") {
    import spark.implicits._
    import graft.ops.ScaleOps
    val base = (1L to 997L).map(i => (i * 7 % 1009, s"v$i")) // unique keys, shuffled
    val a = ScaleOps.contiguousIds(base.toDF("k", "v"), Seq("k"), numPartitions = 7)
    val b = ScaleOps.contiguousIds(
      base.reverse.toDF("k", "v").repartition(13), Seq("k"), numPartitions = 3)
    val ga = a.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    val gb = b.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ga.toSeq == gb.toSeq)                       // layout-invariant
    assert(ga.map(_._2).toSeq == (0L until 997L))      // dense, in key order
    assert(ga.map(_._1).toSeq == ga.map(_._1).sorted.toSeq)
  }

  test("bm25Scores matches an independent reference; non-matching docs absent") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "spark query spark table"),  // tf(spark)=2 tf(query)=1, dl=4
      (2L, "table scan row filter"),    // tf(filter)=1, dl=4
      (3L, "nothing relevant here at all"), // no hits, dl=5
      (4L, "query query query")         // tf(query)=3, dl=3
    ).toDF("doc_id", "text")
    val got = TextOps.bm25Scores(docs, "doc_id", "text",
      Seq("spark", "query", "filter"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // independent reference (plain scala math, unrounded — the op rounds
    // its output to 6 decimals, so compare within that half-quantum)
    val n = 4.0; val avgdl = (4 + 4 + 5 + 3) / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def ts(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp = Map(
      1L -> (2L, ts(2, 4, 1) + ts(1, 4, 2)), // spark df=1, query df=2
      2L -> (1L, ts(1, 4, 1)),               // filter df=1
      4L -> (1L, ts(3, 3, 2)))
    assert(got.map(_._1) == List(1L, 2L, 4L)) // doc 3 absent
    got.foreach { case (id, hits, score) =>
      assert(hits == exp(id)._1)
      assert(math.abs(score - exp(id)._2) < 6e-7, s"doc $id")
    }
  }

  test("sampleNegatives: deterministic, label-disjoint, layout-invariant") {
    import spark.implicits._
    val rows: Seq[(Long, Option[Int])] =
      (0L until 200L).map(i => (i, Some((i % 4).toInt))) :+
        (200L, None: Option[Int])
    val df = rows.toDF("id", "label")
    val a = Curation.sampleNegatives(df, "id", "label", k = 6, seed = 7L)
      .orderBy("anchor_id", "slot").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = Curation.sampleNegatives(df.repartition(13), "id", "label",
      k = 6, seed = 7L, numPartitions = 3)
      .orderBy("anchor_id", "slot").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b) // layout- and partitioning-invariant
    val labelOf = rows.dropRight(1).map { case (id, l) => id -> l.get }.toMap
    a.foreach { case (anchor, slot, neg) =>
      assert(slot >= 0 && slot < 6)
      assert(neg != anchor)
      assert(labelOf(neg) != labelOf(anchor)) // never a same-label negative
      assert(neg != 200L && anchor != 200L)   // null-label row excluded
    }
    // expected yield ~ k*(1 - 1/4); allow a generous band
    val perAnchor = a.groupBy(_._1).view.mapValues(_.size).values
    val mean = perAnchor.sum.toDouble / 200
    assert(mean > 3.0 && mean <= 6.0, s"mean yield $mean")
    // a different seed draws a different sample
    val c = Curation.sampleNegatives(df, "id", "label", k = 6, seed = 8L)
      .orderBy("anchor_id", "slot").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(c != a)
  }

  test("pmiCollocations: hand-computed score, minCount gate") {
    import spark.implicits._
    import graft.ops.TextOps
    // corpus: "new york" appears 3x, tokens: new:3 york:3 city:2 big:2
    // bigram stream: (new,york)x3, (york,city)x2, (big,new)x2... construct:
    val docs = Seq(
      "big new york city",
      "big new york city",
      "new york").toDF("text")
    // tokens T=10: big:2 new:3 york:3 city:2; bigrams TB=7:
    // (big,new):2 (new,york):3 (york,city):2
    val got = TextOps.pmiCollocations(docs, "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == 1) // only (new,york) reaches minCount 3
    val (w1, w2, n, pmi) = got.head
    assert((w1, w2, n) == ("new", "york", 3L))
    val expected = math.log((3.0 * 10 * 10) / (7.0 * 3 * 3))
    assert(math.abs(pmi - expected) < 6e-7, s"pmi $pmi vs $expected")
    // lowering the gate surfaces the count-2 pairs too
    assert(TextOps.pmiCollocations(docs, "text", minCount = 2L).count() == 3)
  }

  test("contaminatedDocs finds exactly the overlapping docs with exact counts") {
    import spark.implicits._
    val evalDf = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma zeta eta"),        // shares 'alpha beta gamma' = 1 shingle
      (2L, "beta gamma delta epsilon theta"),   // shares 2 shingles
      (3L, "totally unrelated text right here") // clean
    ).toDF("doc_id", "text")
    val got = Curation.contaminatedDocs(train, evalDf, "doc_id", "text", shingleSize = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
    // minShared threshold filters
    val strict = Curation.contaminatedDocs(train, evalDf, "doc_id", "text", 3, minShared = 2L)
      .collect().map(_.getLong(0))
    assert(strict.toSeq == Seq(2L))
  }

  test("contaminatedDocsBloom equals contaminatedDocs row-for-row") {
    // real corpus slice: every 11th doc as the eval set, the rest training
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(400).localCheckpoint()
    val train = docs.filter(col("doc_id") % 11 =!= 0)
    val evalDf = docs.filter(col("doc_id") % 11 === 0)
    for (minShared <- Seq(1L, 2L)) {
      val plain = Curation.contaminatedDocs(train, evalDf, "doc_id", "text",
        shingleSize = 3, minShared = minShared)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val bloomed = Curation.contaminatedDocsBloom(train, evalDf, "doc_id",
        "text", shingleSize = 3, minShared = minShared)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(bloomed.toSeq == plain.toSeq)
    }
  }

  test("bloom_might_contain: no false negatives, bounded false positives, codegen") {
    import spark.implicits._
    import graft.functions.ArrayMath
    val members = (0L until 2000L).map(_ * 7919L)
    val bloom = members.toDF("h").stat.bloomFilter("h", 2000L, 0.01)
    val bits = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    // every inserted key passes (the sketch guarantee the confirm-join
    // composition relies on)
    val inserted = members.toDF("h")
      .filter(ArrayMath.bloomMightContain(col("h"), bits)).count()
    assert(inserted == members.size)
    // non-members pass at ~fpp — allow 4x headroom over the nominal 1%
    val probes = (0L until 20000L).map(_ * 7919L + 13L).toDF("h")
    val fp = probes.filter(ArrayMath.bloomMightContain(col("h"), bits)).count()
    assert(fp <= 20000L * 0.04, s"false-positive count $fp above bound")
    // the probe stays inside whole-stage codegen (no fallback to eval);
    // a parquet-backed frame so the filter can't be pre-evaluated by
    // ConvertToLocalRelation
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(xxhash64(col("text")).as("h"))
      .filter(ArrayMath.bloomMightContain(col("h"), bits))
      .queryExecution.executedPlan.toString
    // `*(n)` marks a whole-stage-codegen span in the plan string
    assert("""\*\(\d+\) Filter bloom_might_contain""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("pruneFrequentUnits drops cross-doc boilerplate lines, keeps order") {
    import spark.implicits._
    val banner = "ACME corp all rights reserved"
    val nav = "home | products | contact"
    val docs = Seq(
      (1L, s"$banner\nunique first body\n$nav\nmore first"),
      (2L, s"$banner\nsecond body here\n$nav"),
      (3L, s"$banner\nthird text\nthird extra\n$banner"), // banner twice
      (4L, "entirely original document")).toDF("doc_id", "text")
    val got = Curation.pruneFrequentUnits(docs, "doc_id", "text",
      delim = "\n", maxDocFrac = 0.5)
      .orderBy("doc_id").collect().map(_.getString(1))
    // banner in 3/4 docs (>0.5) goes — BOTH copies in doc 3; nav in 2/4
    // docs (not >0.5) stays; intra-doc order preserved.
    assert(got(0) == s"unique first body\n$nav\nmore first")
    assert(got(1) == s"second body here\n$nav")
    assert(got(2) == "third text\nthird extra")
    assert(got(3) == "entirely original document")
  }

  test("pruneFrequentUnits with nothing frequent is the identity") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text")
    val got = Curation.pruneFrequentUnits(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("a b", "c d", "e f"))
  }

  test("chunkDocuments: boundaries, overlap continuity, short docs") {
    import spark.implicits._
    val toks10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toks10),          // 10 tokens, chunk 4 overlap 1 (step 3): starts 0,3,6
      (2L, "a b"),           // shorter than one chunk -> single chunk
      (3L, "x y z w")).toDF("doc_id", "text") // exactly one chunk (4 tokens)
    val got = Curation.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // start 9 is NOT emitted: its only token (t10) sits inside chunk 2's
    // coverage — redundant-trailing-window rule
    assert(got.filter(_._1 == 1L).map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(got.filter(_._1 == 1L).map(_._3).toSeq == Seq(4L, 4L, 4L))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "a b")))
    assert(got.filter(_._1 == 3L).map(_._4).toSeq == Seq("x y z w"))
    // every token is covered; consecutive chunks share exactly `overlap`
    val chunks1 = got.filter(_._1 == 1L).map(_._4.split(" ").toSeq).toSeq
    chunks1.sliding(2).foreach { pair =>
      assert(pair.head.takeRight(1) == pair.last.take(1)) // overlap 1
    }
  }

  test("chunkDocuments reconstruction: dropping each chunk's overlap prefix rebuilds the doc") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val docs = (1L to 40L).map { i =>
      (i, (1 to (rnd.nextInt(120) + 1)).map(t => s"w$t").mkString(" "))
    }.toDF("doc_id", "text")
    for ((chunk, ov) <- Seq((16, 0), (16, 4), (7, 6), (5, 1))) {
      val rebuilt = Curation.chunkDocuments(docs, "doc_id", "text", chunk, ov)
        .orderBy("doc_id", "chunk_id").collect()
        .groupBy(_.getLong(0)).view.mapValues { rows =>
          rows.sortBy(_.getLong(1)).zipWithIndex.flatMap { case (r, i) =>
            val toks = r.getString(3).split(" ").toSeq
            if (i == 0) toks else toks.drop(ov)
          }.mkString(" ")
        }.toMap
      val original = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rebuilt == original, s"chunk=$chunk overlap=$ov lost or duplicated tokens")
    }
  }

  test("pruneFrequentUnits and sampleToMixture survive degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.pruneFrequentUnits(empty, "doc_id", "text").isEmpty)
    // corpus whose every domain is unweighted -> everything drops
    val docs = Seq((1L, "x"), (2L, "y")).toDF("id", "dom")
    assert(Curation.sampleToMixture(docs, "id", "dom",
      weights = Seq("absent" -> 1.0), budgetFrac = 0.5).isEmpty)
  }

  test("unimaxAllocation: waterfill on a hand case; all-funded and single-domain edges") {
    import spark.implicits._
    // capacities (maxEpochs=2): a=20, b=60, c=200. budget=120:
    // a funded (20*3+0=60<=120), b funded (60*2+20=140>120? no) —
    // b UNfunded; level=(120-20)/2=50 for b and c.
    val docs = Seq(("a", 10L), ("b", 30L), ("c", 100L)).toDF("dom", "t")
    val got = Curation.unimaxAllocation(docs, "dom", "t", budget = 120L,
        maxEpochs = 2L)
      .orderBy("dom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 10L, 20L, true, 20L),
      ("b", 30L, 60L, false, 50L), ("c", 100L, 200L, false, 50L)),
      s"got ${got.toSeq}")
    // budget above total capacity: every domain funded at capacity
    val all = Curation.unimaxAllocation(docs, "dom", "t", budget = 1000L,
        maxEpochs = 2L).collect()
    assert(all.forall(_.getBoolean(3)) &&
      all.map(_.getLong(4)).sum == 280L)
    // single domain, budget below capacity: the whole budget flows to it
    val one = Curation.unimaxAllocation(
      Seq(("x", 100L)).toDF("dom", "t"), "dom", "t",
      budget = 77L, maxEpochs = 3L).head()
    assert(!one.getBoolean(3) && one.getLong(4) == 77L)
  }

  test("sampleToMixture hits targets, clamps short domains, drops unweighted") {
    import spark.implicits._
    // web: 8000 rows, books: 1500, code: 500, junk: 1000 (unweighted)
    val df = ((1L to 8000L).map(i => (i, "web")) ++
      (8001L to 9500L).map(i => (i, "books")) ++
      (9501L to 10000L).map(i => (i, "code")) ++
      (10001L to 11000L).map(i => (i, "junk"))).toDF("id", "dom")
    val kept = Curation.sampleToMixture(df, "id", "dom",
      weights = Seq("web" -> 0.5, "books" -> 0.3, "code" -> 0.2),
      budgetFrac = 0.25)
    val counts = kept.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("junk"))
    // total corpus 11000, budget 2750: web target 1375/8000 ≈ 17.2%,
    // books target 825/1500 = 55%, code target 550/500 → clamps to all 500.
    assert(counts("code") == 500L)
    assert(math.abs(counts("web") - 1375L) < 150, counts.toString)
    assert(math.abs(counts("books") - 825L) < 120, counts.toString)
    // deterministic: re-running selects the identical rows
    val again = Curation.sampleToMixture(df.repartition(17), "id", "dom",
      weights = Seq("web" -> 0.5, "books" -> 0.3, "code" -> 0.2),
      budgetFrac = 0.25)
    assert(kept.select("id").except(again.select("id")).isEmpty)
    assert(again.select("id").except(kept.select("id")).isEmpty)
  }

  test("tokenShards: boundaries match the naive cumsum rule; balanced; layout-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0L until 400L).map(i => (i, 1L + rnd.nextInt(200).toLong))
    val df = rows.toDF("doc_id", "toks")
    val nShards = 8
    val got = Curation.tokenShards(df, "doc_id", "toks", nShards,
      numPartitions = 5)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive single-threaded reference: same hash order, same integer rule
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ordered = rows.sortBy { case (id, _) => (md5hex(id.toString), id) }
    val total = rows.map(_._2).sum
    var run = 0L
    val expected = ordered.map { case (id, w) =>
      val s = math.min(nShards - 1L, run * nShards / total)
      run += w
      id -> s
    }.toMap
    assert(got == expected, "shard ids must equal the naive cumsum rule")
    // balance: every shard within one max-document of total/nShards
    val byShard = ordered.map { case (id, w) => (expected(id), w) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxW = rows.map(_._2).max
    byShard.values.foreach { s =>
      assert(math.abs(s - total / nShards) <= maxW + nShards,
        s"shard imbalance: $byShard")
    }
    // layout-invariant: a different input partitioning shards identically
    val again = Curation.tokenShards(df.repartition(13), "doc_id", "toks",
      nShards, numPartitions = 3)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("writeJsonlShards: files + manifest agree; verify catches tampering and missing shards") {
    import spark.implicits._
    import graft.ops.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Seq((0L, 0L, "alpha beta"), (1L, 0L, "gamma"),
      (2L, 1L, "delta")).toDF("doc_id", "shard_id", "text")
    val manifest = Curation.writeJsonlShards(docs, "shard_id", dir)
      .orderBy("shard").collect()
    assert(manifest.map(_.getLong(1)).toSeq == Seq(2L, 1L))
    // the written lines are real JSONL with the shard column factored out
    val line = scala.io.Source.fromFile(
      new java.io.File(dir + "/shard=1").listFiles()
        .filter(_.getName.endsWith(".txt")).head).getLines().next()
    assert(line == """{"doc_id":2,"text":"delta"}""")
    val ok = Curation.verifyJsonlShards(spark, dir)
    assert(ok.filter(!org.apache.spark.sql.functions.col("ok")).count() == 0)

    // tamper one byte inside a shard file -> that shard fails, others pass
    val victim = new java.io.File(dir + "/shard=0").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    bytes(bytes.length / 2) = 'X'.toByte
    java.nio.file.Files.write(victim.toPath, bytes)
    // drop Hadoop's local-FS .crc sidecar: on the object stores this
    // sink targets there is no such sidecar — the manifest must catch
    // the corruption itself, so the test must reach it
    victim.getParentFile.listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val post = Curation.verifyJsonlShards(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("ok")).toMap
    assert(!post(0L) && post(1L), "only the tampered shard fails")

    // a shard directory vanishing entirely also fails verification
    val gone = new java.io.File(dir + "/shard=1")
    gone.listFiles().foreach(_.delete()); gone.delete()
    val post2 = Curation.verifyJsonlShards(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("ok")).toMap
    assert(post2.get(1L).contains(false), "missing shard must report ok=false")
  }

  test("gateDisparity: the four-fifths rule flags the decimated group") {
    import spark.implicits._
    // group A: 8/10 kept; group B: 2/10 kept. overall = 10/20 = 0.5.
    // ratios: A 1.6, B 0.4 -> only B trips the 80% rule.
    val rows = Seq.fill(8)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq.fill(2)(("B", true)) ++ Seq.fill(8)(("B", false))
    val got = Curation.gateDisparity(rows.toDF("g", "keep"), "g", "keep")
      .orderBy("g").collect()
    assert(got(0).getLong(1) == 10L && got(0).getLong(2) == 8L)
    assert(got(0).getDouble(3) == 0.8 && got(0).getDouble(4) == 0.5)
    assert(got(0).getDouble(5) == 1.6 && !got(0).getBoolean(6))
    assert(got(1).getDouble(3) == 0.2 && got(1).getDouble(5) == 0.4 &&
      got(1).getBoolean(6), s"B must trip the rule: ${got(1)}")
  }

  test("gateDisparity: baselineMaxGroup compares against the most-favored group") {
    import spark.implicits._
    // A (huge, low keep) drags the overall baseline down; B is favored;
    // C sits at 50% of B. Overall reading misses C; max-group flags it.
    val rows = Seq.fill(16)(("A", false)) ++ Seq.fill(4)(("A", true)) ++
      Seq.fill(4)(("B", true)) ++ Seq.fill(1)(("B", false)) ++
      Seq.fill(2)(("C", true)) ++ Seq.fill(3)(("C", false))
    // overall = 10/30; C's keep 0.4 vs overall -> ratio 1.2, NOT flagged
    val byOverall = Curation.gateDisparity(rows.toDF("g", "keep"), "g", "keep")
      .orderBy("g").collect()
    assert(!byOverall(2).getBoolean(6), s"overall reading: ${byOverall(2)}")
    // max-group baseline = B's 0.8; C ratio 0.5 -> flagged; A 0.25 -> flagged
    val byMax = Curation.gateDisparity(rows.toDF("g", "keep"), "g", "keep",
      baselineMaxGroup = true).orderBy("g").collect()
    assert(byMax.forall(_.getDouble(4) == 0.8), "baseline must be B's rate")
    assert(byMax(0).getBoolean(6) && !byMax(1).getBoolean(6) &&
      byMax(2).getBoolean(6), s"EEOC reading flags A and C: ${byMax.toSeq}")
  }

  test("stratifiedSample: exact per-stratum counts, min floor, layout-invariant, NULL ids excluded") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("A", i)) ++ (11 to 13).map(i => ("B", i)))
      .toDF("g", "id")
    // floor(10·0.2)=2, floor(3·0.2)=0
    val s0 = Curation.stratifiedSample(df, "g", "id", 0.2)
    val c0 = s0.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c0 == Map("A" -> 2L), s"got $c0")
    // the min floor lifts B to min(2, 3) = 2
    val s1 = Curation.stratifiedSample(df, "g", "id", 0.2, minPerStratum = 2)
    val c1 = s1.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == Map("A" -> 2L, "B" -> 2L), s"got $c1")
    // layout-invariance: same MEMBERS under a different partitioning
    val ids = s1.select("id").collect().map(_.getInt(0)).toSet
    val ids7 = Curation.stratifiedSample(df.repartition(7), "g", "id",
      0.2, minPerStratum = 2).select("id").collect().map(_.getInt(0)).toSet
    assert(ids == ids7, s"$ids vs $ids7")
    // NULL ids have no deterministic rank — excluded
    val withNull = (Seq(("A", Option.empty[Int])) ++
      (1 to 10).map(i => ("A", Some(i)))).toDF("g", "id")
    assert(Curation.stratifiedSample(withNull, "g", "id", 1.0).count() == 10)
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(df, "g", "id", 0.0)
    }
  }

  test("weightedSample: weight-proportional inclusion, deterministic, top-k plan") {
    import spark.implicits._
    // 5000 heavy (w=100) + 5000 light (w=1) rows; a 500-row sample must be
    // dominated by heavy rows (A-ES inclusion ~ weight share)
    val df = (0L until 10000L).map(i =>
      (i, if (i < 5000) 100L else 1L)).toDF("id", "w")
    val sample = Curation.weightedSample(df, "id", "w", k = 500)
    val heavy = sample.filter(col("w") === 100L).count()
    assert(heavy > 450L, s"heavy rows must dominate the sample: $heavy/500")
    assert(sample.count() == 500L)
    // deterministic: identical run, identical sample
    val again = Curation.weightedSample(df.repartition(13), "id", "w", 500)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == sample.select("id").collect().map(_.getLong(0)).toSet,
      "sample must be layout-invariant")
    // distributed top-k, not a global sort
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("mixtureDiversity: uniform, single-source and 75/25 hand values") {
    import spark.implicits._
    def report(rows: Seq[String]) = {
      val r = Curation.mixtureDiversity(rows.toDF("src"), "src").head()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
    }
    // uniform 4×25: H = ln 4, eff = 4, gini = 0, hhi = 1/4
    val u = report(Seq("a", "b", "c", "d").flatMap(s => Seq.fill(25)(s)))
    assert(u._1 == 100L && u._2 == 4L)
    assert(math.abs(u._3 - math.log(4)) < 1e-9 && math.abs(u._4 - 4.0) < 1e-6)
    assert(u._5 == 0.0 && u._6 == 0.25)
    // single source: zero entropy, eff 1, gini 0, hhi 1
    val s1 = report(Seq.fill(7)("only"))
    assert(s1._3 == 0.0 && s1._4 == 1.0 && s1._5 == 0.0 && s1._6 == 1.0)
    // 75/25: gini = (2*(1*25+2*75) - 3*100)/(2*100) = 0.25, hhi = 0.625
    val sk = report(Seq.fill(75)("big") ++ Seq.fill(25)("small"))
    assert(sk._5 == 0.25 && sk._6 == 0.625)
    val expH = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(sk._3 - expH) < 1e-9, s"entropy ${sk._3} vs $expH")
  }

  test("domainReweight: DoReMi EG iterates on a hand-computed trajectory") {
    import spark.implicits._
    // A: excess 2 at step 1, 2+2 at step 3 (two rows — cell summation);
    // B: excess 4 at step 2. η = 0.5 → potentials
    //   S_A = (1, 1, 3), S_B = (0, 2, 2)
    // softmax gaps are all ±1 or 0 → α = σ(±1) or 0.5 per step.
    val losses = Seq(
      ("A", 1L, 2.0), ("A", 3L, 2.0), ("A", 3L, 2.0),
      ("B", 2L, 4.0)).toDF("domain", "step", "excess")
    val out = Curation.domainReweight(losses, "domain", "step", "excess",
        eta = 0.5).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val sig1 = 1.0 / (1.0 + math.exp(-1.0)) // σ(1) = 0.731058578630…
    assert(out("A")._1 == 6.0 && out("B")._1 == 4.0)
    assert(math.abs(out("A")._2 - (sig1 + (1 - sig1) + sig1) / 3) < 1e-9)
    assert(math.abs(out("B")._2 - ((1 - sig1) + sig1 + (1 - sig1)) / 3) < 1e-9)
    assert(math.abs(out("A")._3 - sig1) < 1e-9)
    assert(math.abs(out("B")._3 - (1 - sig1)) < 1e-9)
    // per-step softmax: the mixture always sums to 1
    assert(math.abs(out("A")._2 + out("B")._2 - 1.0) < 1e-9)

    // uniform excess → exactly uniform weights (exp(0) = 1 exactly)
    val unif = Seq(("A", 1L, 1.0), ("B", 1L, 1.0), ("A", 2L, 3.0),
      ("B", 2L, 3.0)).toDF("domain", "step", "excess")
    val u = Curation.domainReweight(unif, "domain", "step", "excess")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(u.forall { case (a, f) => a == 0.5 && f == 0.5 })

    // negative excess clips to 0 (Group-DRO never down-weights on
    // better-than-reference loss); a clipped-to-zero trajectory is flat
    val neg = Seq(("A", 1L, -5.0), ("B", 1L, 0.0)).toDF(
      "domain", "step", "excess")
    val n = Curation.domainReweight(neg, "domain", "step", "excess")
      .collect().map(r => r.getDouble(2))
    assert(n.forall(_ == 0.5))

    require(scala.util.Try(Curation.domainReweight(losses, "domain",
      "step", "excess", eta = 0.125)).isFailure, "eta precision guard")
  }
}
