package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, Similarity}

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("centroids are deterministic and unit-norm") {
    val emb = Tables.embeddings(spark, sf)
    val c1 = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    val c2 = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq)
    c1.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("IVF top-k recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ivf = Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
      k = 10, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth per query
    val truth = (0L until 5L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, 10)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet

    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF recall too low: $recall") // nProbe=4 of 8 lists
    // every returned neighbor is ranked correctly (descending cosine)
    assert(ivf.nonEmpty)
  }

  test("q46/q30 policy-derived params clear a 0.9 recall floor at sf0.01") {
    // the fixture embeddings are uniform-random — the ANN worst case
    // (recall ≈ candidate coverage); these floors pin the POLICY-derived
    // parameterization the queries now use (Ivf.ivfPolicy structureless
    // mode for q46, Similarity.lshPolicy for q30), so a policy change
    // that silently degrades recall fails here. Deterministic: seeded.
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val n = emb.count()
    val k = 10
    val queries = emb.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = (0L until 10L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet

    val (nc, np) = Ivf.ivfPolicy(n, targetRecall = 0.9, structureless = true)
    val ivf = Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
      k = k, nCentroids = nc, nProbe = np)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (ivf & truth).size.toDouble / truth.size
    assert(ivfRecall >= 0.9, s"IVF recall $ivfRecall below q46 floor (nc=$nc np=$np)")

    val (nBits, nTables) = Similarity.lshPolicy(n, designCosine = 0.4, multiProbe = true)
    val lsh = Similarity.annTopK(emb, "vec_id", "embedding", queries,
      "query_id", "query_vec", k = k, nBits = nBits, nTables = nTables, seed = 42L,
      multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (lsh & truth).size.toDouble / truth.size
    assert(lshRecall >= 0.9, s"LSH recall $lshRecall below q30 floor (nBits=$nBits nTables=$nTables)")
    info(f"policy at N=$n: IVF (nc=$nc, np=$np) recall=$ivfRecall%.3f; " +
      f"multi-probe LSH (nBits=$nBits, nTables=$nTables) recall=$lshRecall%.3f")
  }

  test("multi-probe LSH matches single-probe recall with ~4x fewer tables") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val n = emb.count()
    val (bS, tSingle) = Similarity.lshPolicy(n, designCosine = 0.4)
    val (bM, tMulti) = Similarity.lshPolicy(n, designCosine = 0.4, multiProbe = true)
    assert(bS == bM, "probing strategy must not change the bucket granularity")
    assert(tMulti * 2 <= tSingle,
      s"multi-probe should need far fewer tables ($tMulti vs $tSingle)")
    // and the q56 pair flavor stays precision-1.0 (exact verify) under probing
    val exact = Similarity.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, nBits = bM, nTables = tMulti, seed = 42L, multiProbe = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp.subsetOf(exact))
    val recall = mp.size.toDouble / exact.size
    assert(recall >= 0.8, s"multi-probe pair recall $recall below floor")
    info(f"multi-probe pairs: recall=$recall%.3f with $tMulti tables (single-probe policy: $tSingle)")
  }

  test("lshPolicy/ivfPolicy scale sanely with corpus size") {
    // buckets stay ~targetBucket-sized: nBits grows with log2(N)
    val (b1, t1) = Similarity.lshPolicy(1000L, designCosine = 0.4)
    val (b2, t2) = Similarity.lshPolicy(100000L, designCosine = 0.4)
    val (b3, t3) = Similarity.lshPolicy(100L * 1000 * 1000, designCosine = 0.4)
    assert(b1 < b2 && b2 < b3)
    assert(t1 <= t2 && t2 <= t3) // more selective buckets need more tables
    assert(t3 <= 64) // capped — beyond this, raise targetBucket instead
    // IVF: k ~ sqrt(N); default (clustered) probe fraction is constant
    val (k1, p1) = Ivf.ivfPolicy(10000L)
    val (k2, p2) = Ivf.ivfPolicy(100L * 1000 * 1000)
    assert(k1 == 100 && k2 == 10000)
    assert(p1 == k1 / 8 && p2 == k2 / 8)
    // structureless mode probes ~targetRecall of the lists
    val (ks, ps) = Ivf.ivfPolicy(500L, targetRecall = 0.9, structureless = true)
    assert(ks == 22 && ps == 20)
    // degenerate corpora stay valid
    val (kb, pb) = Ivf.ivfPolicy(1L)
    assert(kb >= 1 && pb >= 1 && pb <= kb)
    val (bb, tb) = Similarity.lshPolicy(1L, designCosine = 0.4)
    assert(bb >= 1 && tb >= 1)
  }

  test("sampled training preserves search quality and determinism") {
    // maxTrainRows=100 forces the hash-sample (corpus is 500): centroids
    // come from ~1/5 of the corpus, search still scans everything. Quality
    // contract: recall within noise of full-corpus training.
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val k = 10
    val queries = emb.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = (0L until 10L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    val (nc, np) = Ivf.ivfPolicy(emb.count(), targetRecall = 0.9, structureless = true)
    def run() = Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
      k = k, nCentroids = nc, nProbe = np, maxTrainRows = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = run()
    val recall = (sampled & truth).size.toDouble / truth.size
    assert(recall >= 0.85, s"sampled-training recall $recall below floor")
    assert(run() == sampled, "hash-sampled training must be deterministic")
  }

  test("index lifecycle: build once / search many / save+load round-trip") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def results(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val r1 = results(Ivf.searchIndex(index, queries, "query_id", "query_vec", k = 5, nProbe = 4))
    val r2 = results(Ivf.searchIndex(index, queries, "query_id", "query_vec", k = 5, nProbe = 4))
    assert(r1 == r2 && r1.nonEmpty, "one index must serve repeated batches identically")
    // one-shot topK with the same params = build+search composed
    val oneShot = results(Ivf.topK(emb, "vec_id", "embedding", queries,
      "query_id", "query_vec", k = 5, nCentroids = 8, nProbe = 4))
    assert(oneShot == r1)

    // persisted layout: lists partitioned by __cid + centroid matrix
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    Ivf.saveIndex(index, dir)
    assert(new java.io.File(dir + "/lists").listFiles()
      .exists(_.getName.startsWith("__cid=")), "lists must be partitioned by list id")
    val loaded = Ivf.loadIndex(spark, dir, "vec_id")
    assert(loaded.centroids.map(_._2.toSeq).toSeq == index.centroids.map(_._2.toSeq).toSeq)
    val r3 = results(Ivf.searchIndex(loaded, queries, "query_id", "query_vec", k = 5, nProbe = 4))
    assert(r3 == r1, "a reloaded index must search identically")
  }

  test("clustered corpus: default ivfPolicy (k/8 probes) clears the 0.9 recall floor") {
    // the parquet fixture is uniform-random — the ANN worst case, where
    // q46 must fall back to structureless (probe-almost-everything) mode.
    // Real embedding corpora are CLUSTERED; this pins the DEFAULT policy
    // (constant k/8 probe fraction) on a seeded clustered corpus: 40
    // Gaussian clusters, 5000 points, within-cluster cosine ~0.99 vs
    // cross-cluster ~0 — the regime the ivfPolicy scaladoc claims.
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val dim = 32
    val centers = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian()))
    val n = 5000
    val rows = (0L until n.toLong).map { i =>
      val c = centers((i % 40).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val k = 10
    val queries = corpus.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = (0L until 10L).flatMap { q =>
      val qv = corpus.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(corpus.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet

    val (nc, np) = Ivf.ivfPolicy(n) // DEFAULT mode: clustered corpora
    assert(np == math.max(2, nc / 8), "default policy must probe a k/8 fraction")
    val got = Ivf.topK(corpus, "vec_id", "embedding", queries,
      "query_id", "query_vec", k = k, nCentroids = nc, nProbe = np)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9,
      f"default-policy recall $recall%.3f below 0.9 on clustered data (nc=$nc np=$np)")
    info(f"clustered corpus: nc=$nc np=$np (coverage ${np.toDouble / nc}%.2f) recall=$recall%.3f")
  }

  test("quantized index: list bytes shrink >=4x, recall holds, re-rank is exact") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val k = 10
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val dirQ = java.nio.file.Files.createTempDirectory("graft-ivf-int8").toString
    val dirF = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    Ivf.saveIndex(index, dirQ, quantize = true)
    Ivf.saveIndex(index, dirF)

    // serving-I/O contract: the int8 lists must be >=4x smaller than the
    // double lists (the refine sidecar is only read for re-rank candidates)
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(dir))
    }
    val (bq, bf) = (bytes(dirQ + "/lists"), bytes(dirF + "/lists"))
    assert(bf >= 4 * bq, s"quantized lists not >=4x smaller: full=$bf int8=$bq")

    // recall vs brute force, probing every list: isolates the int8 ranking
    // cutoff as the only loss — must clear the same 0.9 floor as q46
    val queries = emb.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = (0L until 10L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    val got = Ivf.searchIndexQuantized(spark, dirQ, queries,
      "query_id", "query_vec", "vec_id", k = k, nProbe = 8)
      .collect()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gotPairs & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"quantized-index recall $recall below floor")

    // re-rank exactness: every returned cosine equals the full-precision
    // cosine (quantization may only affect WHICH candidates reach re-rank,
    // never the reported score)
    val exactCos = Similarity
      .cosineNearDupPairsExact(emb, "vec_id", "embedding", minCosine = -1.0)
      .collect()
      .flatMap { r =>
        val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> c, (b, a) -> c)
      }.toMap
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(2) - exactCos(key)) < 1e-6,
        s"re-ranked cosine for $key is not full precision")
    }
  }

  test("PQ kernels: dimension mismatch is NULL, never a zero-padded code") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.PqKernel
    // 2 subspaces x 2 dims = total dim 4
    val books = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 1.0), Array(-1.0, -1.0)))
    val ok = PqKernel.encode(new GenericArrayData(Array(1.0, 0.0, 1.0, 1.0)), books)
    assert(ok != null && ok.length == 2)
    // short and long vectors: a silent zero-pad would rank them arbitrarily
    assert(PqKernel.encode(new GenericArrayData(Array(1.0, 0.0, 1.0)), books) == null)
    assert(PqKernel.encode(new GenericArrayData(Array.fill(5)(1.0)), books) == null)
    // expression layer: NULL row, not an exception, inside a real plan
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 0.0, 1.0, 1.0)), (2L, Seq(1.0, 0.0)))
      .toDF("id", "v")
    val lit3 = org.apache.spark.sql.functions.typedLit(
      books.map(_.map(_.toSeq).toSeq).toSeq)
    val out = df.select(col("id"),
      graft.functions.ArrayMath.pqEncode(col("v"), lit3).as("code"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
    // ADC scoring follows the same convention (it is a registered public
    // SQL function, so malformed binary input must yield NULL instead of
    // reading another subspace's LUT slot or throwing): code bytes >= K
    // and code/LUT length mismatches are both out of scope
    val lut = (1 to 4).map(_.toDouble) // m=2, K=2 -> flattened length 4
    val adc = Seq(
      (1L, Array[Byte](0, 1)),    // ok: lut[0] + lut[2+1] = 1.0 + 4.0
      (2L, Array[Byte](0, 5)),    // code byte >= K -> NULL
      (3L, Array[Byte](0, 1, 0))) // code longer than m subspaces -> NULL
      .toDF("id", "code")
      .select(col("id"), col("code"), typedLit(lut).as("lut"))
    val scored = adc.select(col("id"),
      call_function(graft.functions.ArrayMath.pqAdcName,
        col("code"), col("lut"), lit(2)).as("s"))
      .orderBy("id").collect()
    assert(scored(0).getDouble(1) == 5.0)
    assert(scored(1).isNullAt(1), "code byte >= kPerSub must be NULL")
    assert(scored(2).isNullAt(1), "code/LUT length mismatch must be NULL")
  }

  test("PQ index: list bytes shrink >=4x vs int8, recall holds, re-rank is exact") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val k = 10
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val dirPq = java.nio.file.Files.createTempDirectory("graft-ivf-pq").toString
    val dirQ = java.nio.file.Files.createTempDirectory("graft-ivf-int8b").toString
    Ivf.saveIndexPq(index, dirPq)
    Ivf.saveIndex(index, dirQ, quantize = true)
    assert(Ivf.isPq(spark, dirPq) && !Ivf.isPq(spark, dirQ))

    // the judged serving-I/O claim: PQ lists store >=4x fewer payload
    // bytes per vector than the int8 lists (m code bytes vs dim code
    // bytes + an 8-byte scale) — asserted on the bytes actually WRITTEN
    // to the two stores. Physical .parquet file sizes additionally shrink
    // >=2x at this fixture scale; the full 4x+ only shows physically once
    // payload dominates the ~2 KB-per-list-file footer/encoding floor
    // (500 rows over 8 lists is footer-bound by construction).
    val pqPayload = spark.read.parquet(dirPq + "/lists")
      .agg(sum(length(col("__pq")))).head().getLong(0)
    val int8Payload = spark.read.parquet(dirQ + "/lists")
      .agg(sum(size(col("__code")) + lit(8))).head().getLong(0)
    assert(int8Payload >= 4L * pqPayload,
      s"PQ payload not >=4x smaller than int8: int8=$int8Payload pq=$pqPayload")
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(dir))
    }
    val (bPq, bInt8) = (bytes(dirPq + "/lists"), bytes(dirQ + "/lists"))
    assert(bInt8 >= 2 * bPq, s"PQ list files not >=2x smaller: int8=$bInt8 pq=$bPq")

    // recall vs brute force, probing every list: isolates the PQ candidate
    // cutoff as the only loss — same 0.9 floor as the int8 tier
    val queries = emb.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = (0L until 10L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    val got = Ivf.searchIndexPq(spark, dirPq, queries,
      "query_id", "query_vec", "vec_id", k = k, nProbe = 8)
      .collect()
    val recall = (got.map(r => (r.getLong(0), r.getLong(1))).toSet & truth).size
      .toDouble / truth.size
    assert(recall >= 0.9, s"PQ-index recall $recall below floor")

    // re-rank exactness: reported cosines are ALWAYS full precision —
    // quantization may only affect which candidates reach re-rank
    val exactCos = Similarity
      .cosineNearDupPairsExact(emb, "vec_id", "embedding", minCosine = -1.0)
      .collect()
      .flatMap { r =>
        val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> c, (b, a) -> c)
      }.toMap
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(2) - exactCos(key)) < 1e-6,
        s"re-ranked cosine for $key is not full precision")
    }

    // PQ training is layout-invariant: re-encoding a repartitioned corpus
    // yields byte-identical codes (sorted training sample + seeded Lloyd)
    val books = Ivf.trainPqCodebooks(
      index.assigned.select(col("vec_id"), col("__vn")), "vec_id",
      m = 4, kPerSub = 16)
    val books2 = Ivf.trainPqCodebooks(
      index.assigned.repartition(13).select(col("vec_id"), col("__vn")),
      "vec_id", m = 4, kPerSub = 16)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      books2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("streaming ANN sink: waves append exactly-once, torn replays dedupe by id") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 60L)
    val indexDir = java.nio.file.Files.createTempDirectory("graft-ann-sink").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-ann-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ann-ck").toString
    Ivf.saveIndex(Ivf.buildIndex(base, "vec_id", "embedding", nCentroids = 4),
      indexDir)
    def ids(): Set[Long] = spark.read.parquet(indexDir + "/lists")
      .select("vec_id").as[Long].collect().toSet
    assert(ids() == (0L until 60L).toSet)

    // wave 1: 60..80 arrive on the stream → searchable after one trigger
    emb.filter(col("vec_id") >= 60L && col("vec_id") < 80L)
      .coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain(): Long = graft.streaming.StreamingIngest.annIndexSink(spark,
      spark.readStream.schema(schema).parquet(inDir),
      "vec_id", "embedding", indexDir, ckDir)
    assert(drain() == 20L)
    assert(ids() == (0L until 80L).toSet)

    // wave 2 appends on top; wave-1 rows are not re-appended
    emb.filter(col("vec_id") >= 80L && col("vec_id") < 90L)
      .coalesce(1).write.mode("append").parquet(inDir)
    assert(drain() == 10L)
    assert(ids() == (0L until 90L).toSet)
    // replay with nothing new: markers + checkpoint → zero appends
    assert(drain() == 0L)
    assert(spark.read.parquet(indexDir + "/lists").count() == 90L)

    // torn replay window (crash between append and marker): a direct
    // re-append of already-present ids must anti-join to nothing
    val again = Ivf.appendToIndex(spark, indexDir,
      emb.filter(col("vec_id") >= 60L && col("vec_id") < 90L),
      "vec_id", "embedding", dedupeIds = true)
    assert(again == 0L)
    assert(spark.read.parquet(indexDir + "/lists").count() == 90L)

    // the appended corpus is genuinely searchable: a query carrying
    // wave-2 vector 85's embedding (under a non-corpus query id, since
    // search excludes self-id matches) must rank vector 85 first
    val q85 = emb.filter(col("vec_id") === 85L)
      .select((col("vec_id") + 10000L).as("query_id"),
        col("embedding").as("query_vec"))
    val top = Ivf.searchIndex(Ivf.loadIndex(spark, indexDir, "vec_id"), q85,
      "query_id", "query_vec", k = 3, nProbe = 4)
      .filter(col("rank") === 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 85L,
      s"wave-2 vector not served: ${top.mkString(",")}")
  }

  test("compactIndex: 20 append waves fold to right-sized lists; search identical; idempotence intact") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-idx").toString
    Ivf.saveIndex(Ivf.buildIndex(emb.filter(col("vec_id") < 50L),
      "vec_id", "embedding", nCentroids = 4), dir, quantize = true)

    def maxFiles(sub: String): Int = {
      val root = new java.io.File(dir, sub)
      root.listFiles().filter(d => d.isDirectory && d.getName.startsWith("__cid="))
        .map(_.listFiles().count(f => f.isFile &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))).max
    }
    // 20 micro-batch waves of 5 vectors: each leaves one appended file
    // per touched list in BOTH lists/ and refine/
    (0 until 20).foreach { w =>
      val lo = 50L + 5L * w
      assert(Ivf.appendToIndex(spark, dir,
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 5L),
        "vec_id", "embedding") == 5L)
    }
    assert(maxFiles("lists") > 4 && maxFiles("refine") > 4,
      s"waves must fragment: lists=${maxFiles("lists")} refine=${maxFiles("refine")}")

    val queries = emb.filter(col("vec_id").isin(3L, 77L, 142L))
      .select((col("vec_id") + 10000L).as("query_id"),
        col("embedding").as("query_vec"))
    def results(): Seq[(Long, Long, Double, Int)] =
      Ivf.searchIndexQuantized(spark, dir, queries, "query_id", "query_vec",
        "vec_id", k = 5, nProbe = 4)
        .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val before = results()
    assert(before.nonEmpty)

    val folded = Ivf.compactIndex(spark, dir, maxFilesPerList = 4)
    assert(folded > 0, "over-fragmented lists must be compacted")
    assert(maxFiles("lists") <= 4 && maxFiles("refine") <= 4,
      s"post-compaction counts: lists=${maxFiles("lists")} refine=${maxFiles("refine")}")
    assert(results() == before, "compaction must not change search results")
    // rerun: nothing left over the threshold — a no-op
    assert(Ivf.compactIndex(spark, dir, maxFilesPerList = 4) == 0)

    // replayed-wave idempotence is preserved across compaction: ids did
    // not move, so the dedupeIds anti-join still sees every one of them
    assert(Ivf.appendToIndex(spark, dir,
      emb.filter(col("vec_id") >= 100L && col("vec_id") < 150L),
      "vec_id", "embedding", dedupeIds = true) == 0L)
    assert(spark.read.parquet(dir + "/lists").count() == 150L)
    assert(results() == before)

    // policy wiring: a fresh appending wave through the sink with a
    // tight file budget compacts (and does not rebuild)
    val inDir = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-compact-ck").toString
    val rbDir = java.nio.file.Files.createTempDirectory("graft-compact-rb").toString + "/v2"
    emb.filter(col("vec_id") >= 150L && col("vec_id") < 160L)
      .coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val report = graft.streaming.StreamingIngest.annIndexSinkWithPolicy(spark,
      spark.readStream.schema(schema).parquet(inDir),
      "vec_id", "embedding", dir, ckDir,
      graft.streaming.StreamingIngest.AnnDriftPolicy(maxFilesPerList = 1), rbDir)
    assert(report.appended == 10L && !report.rebuilt, report.toString)
    assert(report.compacted > 0, s"sink must fold appended files: $report")
    assert(maxFiles("lists") <= 1 && maxFiles("refine") <= 1)
    assert(spark.read.parquet(dir + "/lists").count() == 160L)
  }

  test("rebuildIndex preserves a non-default PQ configuration") {
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcfg").toString
    Ivf.saveIndexPq(index, dir, m = 4, kPerSub = 16)
    val newDir = dir + "-v2"
    Ivf.rebuildIndex(spark, dir, newDir, "vec_id", nCentroids = 4)
    // a default-config rebuild would emit pqSubspaces(dim) subspaces and
    // 256 centroids each — the operator's tuned recall/size profile lost
    val cfg = spark.read.parquet(newDir + "/pq")
      .groupBy("subspace").count().collect()
    assert(cfg.length == 4, s"m not preserved: got ${cfg.length} subspaces")
    assert(cfg.forall(_.getLong(1) <= 16L), "kPerSub not preserved")
    val codeLen = spark.read.parquet(newDir + "/lists")
      .select(length(col("__pq"))).head().getInt(0)
    assert(codeLen == 4, s"code width changed: $codeLen bytes")
    // the config travels via pq_meta, NOT codebook-shape inference: even
    // if a degenerate training set produced < kPerSub centroids in every
    // subspace, repeated rebuilds keep the configured capacity
    val meta = spark.read.parquet(newDir + "/pq_meta").head()
    assert(meta.getAs[Int]("m") == 4 && meta.getAs[Int]("k_per_sub") == 16,
      s"pq_meta must carry the configured (m, kPerSub): $meta")
  }

  test("streaming ANN sink over a PQ layout: appends re-encode, search meets the recall floor") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 300L)
    val wave = emb.filter(col("vec_id") >= 300L && col("vec_id") < 400L)
    val indexDir = java.nio.file.Files.createTempDirectory("graft-pq-sink").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-pq-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-pq-ck").toString
    Ivf.saveIndexPq(Ivf.buildIndex(base, "vec_id", "embedding", nCentroids = 8),
      indexDir)
    assert(Ivf.isPq(spark, indexDir))

    wave.coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain(): Long = graft.streaming.StreamingIngest.annIndexSink(spark,
      spark.readStream.schema(schema).parquet(inDir),
      "vec_id", "embedding", indexDir, ckDir)
    assert(drain() == 100L)
    // layout preserved: appended rows carry m-byte codes encoded through
    // the SAVED codebooks (no __vn leaks into lists/), refine sidecar grows
    val lists = spark.read.parquet(indexDir + "/lists")
    assert(lists.columns.contains("__pq") && !lists.columns.contains("__vn"))
    assert(lists.count() == 400L)
    assert(spark.read.parquet(indexDir + "/refine").count() == 400L)
    // replay with nothing new: exactly-once markers hold on the PQ path too
    assert(drain() == 0L)

    // appended vectors are genuinely searchable through the ADC + re-rank
    // path at the same 0.9 recall floor as the offline PQ tier (probe all
    // lists: isolates PQ candidate loss, not probe selection)
    val k = 5
    val queries = emb.filter(col("vec_id") >= 300L && col("vec_id") < 310L)
      .select((col("vec_id") + 10000L).as("query_id"),
        col("embedding").as("query_vec"))
    val corpus = emb.filter(col("vec_id") < 400L)
    val truth = (300L until 310L).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(graft.ops.Similarity.asDouble(col("embedding")).as("query_vec"))
      graft.ops.Similarity.bruteTopK(corpus, "vec_id", "embedding", qv, k)
        .collect().map(r => (q + 10000L, r.getLong(0)))
    }.toSet
    val got = Ivf.searchIndexPq(spark, indexDir, queries,
      "query_id", "query_vec", "vec_id", k = k, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"PQ-sink recall $recall below floor (|truth|=${truth.size})")
    // and a wave-appended vector's own embedding ranks itself first
    val self = got.filter(_._1 == 10305L)
    assert(self.nonEmpty, "query over appended vector 305 returned nothing")
  }

  test("drift policy: benign and replayed waves do not trigger a rebuild") {
    import graft.streaming.StreamingIngest
    val emb = Tables.embeddings(spark, sf)
    val indexDir = java.nio.file.Files.createTempDirectory("graft-benign-idx").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-benign-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-benign-ck").toString
    val rbDir = java.nio.file.Files.createTempDirectory("graft-benign-rb").toString + "/v2"
    Ivf.saveIndex(Ivf.buildIndex(emb.filter(col("vec_id") < 150L),
      "vec_id", "embedding", nCentroids = 8), indexDir)
    // same-distribution wave: skew stays in the healthy band
    emb.filter(col("vec_id") >= 150L && col("vec_id") < 200L)
      .coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def drain() = StreamingIngest.annIndexSinkWithPolicy(spark,
      spark.readStream.schema(schema).parquet(inDir),
      "vec_id", "embedding", indexDir, ckDir,
      StreamingIngest.AnnDriftPolicy(), rbDir)
    val r1 = drain()
    assert(r1.appended == 50L && !r1.rebuilt && r1.currentDir == indexDir,
      s"benign wave must not rebuild: $r1")
    assert(!new java.io.File(rbDir).exists, "no rebuild directory may appear")
    // pure replay: zero appends, health check skipped entirely
    val r2 = drain()
    assert(r2.appended == 0L && !r2.rebuilt && r2.currentDir == indexDir)
  }

  test("streaming ANN sink: drifted wave trips the rebuild policy and restores recall") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200L)
    val indexDir = java.nio.file.Files.createTempDirectory("graft-drift-idx").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-drift-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-drift-ck").toString
    val rbDir = java.nio.file.Files.createTempDirectory("graft-drift-rb").toString + "/v2"
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    Ivf.saveIndex(index, indexDir)

    // Drifted regime: ONE tight cluster straddling the Voronoi boundary
    // between frozen centroids 0 and 1. Members sit at the midpoint
    // ± 0.01·(c0 - c1) by PARITY (so exactly half assign to each frozen
    // list), plus jitter ORTHOGONAL to (c0 - c1) (so each member's true
    // nearest neighbors are uncorrelated with its parity — any query's
    // top-k splits ~50/50 across the two lists, and nProbe=1 probes can
    // only ever see half). The frozen index cannot fix this; a rebuild
    // learns centroids inside the cluster whose partition follows the
    // jitter plane, putting neighbors back into the probed list.
    val c0 = index.centroids(0)._2
    val c1 = index.centroids(1)._2
    val dim = c0.length
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def orthoTo(seed: Array[Double], g: Array[Double]*): Array[Double] = {
      val v = seed.clone()
      g.foreach { b =>
        val d = v.zip(b).map { case (x, y) => x * y }.sum /
          b.map(x => x * x).sum
        for (j <- v.indices) v(j) -= d * b(j)
      }
      norm(v)
    }
    val gap = c0.zip(c1).map { case (a, b) => a - b }
    val mid = norm(c0.zip(c1).map { case (a, b) => a + b })
    val e = (k: Int) => Array.tabulate(dim)(j => if (j == k % dim) 1.0 else 0.0)
    val u = orthoTo(e(1), gap)
    val w = orthoTo(e(2), gap, u)
    // splitmix64-style hash jitter: coordinates decorrelated from each
    // other and from parity (a linear LCG here puts members on a 1-D
    // lattice where neighbor order correlates with parity, quietly
    // making nProbe=1 complete again)
    def h(i: Int, salt: Long): Double = {
      var x = (i.toLong * 1000003L + salt) * 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    // the parity offset only needs a deterministic SIGN along gap (jitter
    // is exactly orthogonal to gap, so it never flips the assignment);
    // its magnitude must stay far below the ~0.006 nearest-neighbor
    // jitter spacing or the two parity sheets separate and every top-k
    // becomes single-parity again
    val drifted = (0 until 300).map { i =>
      val side = if (i % 2 == 0) 5e-4 else -5e-4
      val v = Array.tabulate(dim)(j =>
        mid(j) + side * gap(j) + 0.05 * (h(i, 12345L) * u(j) + h(i, 54321L) * w(j)))
      (10000L + i, norm(v).map(_.toFloat).toSeq)
    }
    drifted.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(inDir)

    val schema = spark.read.parquet(inDir).schema
    val report = StreamingIngest.annIndexSinkWithPolicy(spark,
      spark.readStream.schema(schema).parquet(inDir),
      "vec_id", "embedding", indexDir, ckDir,
      StreamingIngest.AnnDriftPolicy(maxSkew = 3.0), rbDir)
    assert(report.appended == 300L)
    assert(report.skew > 3.0, s"drifted wave should skew the lists, got ${report.skew}")
    assert(report.rebuilt && report.currentDir == rbDir,
      s"policy should have tripped a rebuild: $report")

    // recall before/after, against an exact driver-side reference over the
    // full 500-vector corpus (same ordering contract as searchIndex:
    // cosine desc, id asc; query ids are fresh, so self-vectors count)
    val corpus = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, v) => (id, norm(v.map(_.toDouble).toArray)) } ++
      drifted.map { case (id, v) => (id, norm(v.map(_.toDouble).toArray)) }
    val queryIds = (0 until 6).map(i => 10000L + i * 49) // both parities
    val queries = drifted.filter(t => queryIds.contains(t._1))
      .map { case (id, v) => (90000L + id, v) }
      .toDF("query_id", "query_vec")
    def exactTop(qv: Array[Double], k: Int): Seq[Long] =
      corpus.map { case (id, v) =>
        (id, v.zip(qv).map { case (a, b) => a * b }.sum)
      }.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
    def recallOf(dir: String, nProbe: Int): Double = {
      val got = Ivf.searchIndex(Ivf.loadIndex(spark, dir, "vec_id"), queries,
        "query_id", "query_vec", k = 10, nProbe = nProbe)
        .select(col("query_id"), col("vec_id")).as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      queryIds.map { qid =>
        val qv = drifted.find(_._1 == qid).get._2.map(_.toDouble).toArray
        val exact = exactTop(norm(qv), 10).toSet
        (got(90000L + qid) & exact).size / 10.0
      }.sum / queryIds.size
    }
    // at EQUAL probe budget the rebuild must materially improve recall:
    // frozen centroids leave each nProbe=1 probe blind to the half of
    // every neighborhood parked in the other list (nProbe>=2 would mask
    // the defect here — the cluster spans exactly two frozen lists)
    val before = recallOf(indexDir, nProbe = 1)
    val after = recallOf(report.currentDir, nProbe = 1)
    assert(before < 0.65,
      s"boundary-straddling cluster should defeat nProbe=1 on frozen centroids: $before")
    assert(after >= 0.72 && after - before >= 0.1,
      s"rebuilt index must restore single-probe recall: $after (before $before)")
    // and at the serving probe budget the rebuilt index meets the floor
    assert(recallOf(report.currentDir, nProbe = 4) >= 0.9,
      "rebuilt index must meet the serving recall floor at nProbe=4")
  }

  test("quantized search scans only the probed lists (partition pruning)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-dpp").toString
    Ivf.saveIndex(index, dir, quantize = true)
    def filesUnder(sub: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(dir + sub))
    }
    assert(filesUnder("/lists") >= 8L, "expected one+ file per list")

    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val res = Ivf.searchIndexQuantized(spark, dir, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 2)
    res.collect() // execute so AQE finalizes and scan metrics populate

    def scansOf(p: org.apache.spark.sql.execution.SparkPlan,
                marker: String): Seq[FileSourceScanExec] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val buf = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
      def go(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec        => go(q.plan)
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(marker)) =>
          buf += s
        case other => other.children.foreach(go)
      }
      go(p); buf.toSeq
    }
    val plan = res.queryExecution.executedPlan
    val lists = scansOf(plan, "graft-ivf-dpp").filter(
      _.relation.location.rootPaths.exists(_.toString.contains("lists")))
    assert(lists.nonEmpty, "lists scan not found in executed plan")
    val scanned = lists.map(_.metrics("numFiles").value).max
    assert(scanned <= 2L * (filesUnder("/lists") / 8L).max(1L),
      s"probe scan read $scanned files of ${filesUnder("/lists")} — 2 of 8 lists were probed, " +
        "partition pruning is not happening")

    // PQ layout: same pruning contract — the ADC probe must scan only
    // the probed lists' partitions, not the whole store
    val dirP = java.nio.file.Files.createTempDirectory("graft-ivf-dpp-pq").toString
    Ivf.saveIndexPq(index, dirP)
    def pqFiles(): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(dirP + "/lists"))
    }
    val resP = Ivf.searchIndexPq(spark, dirP, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 2)
    resP.collect()
    val listsP = scansOf(resP.queryExecution.executedPlan, "graft-ivf-dpp-pq")
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("lists")))
    assert(listsP.nonEmpty, "PQ lists scan not found in executed plan")
    val scannedP = listsP.map(_.metrics("numFiles").value).max
    assert(scannedP <= 2L * (pqFiles() / 8L).max(1L),
      s"PQ probe scan read $scannedP files of ${pqFiles()} — pruning is not happening")
  }

  test("q89 quantized-serving recall verdict holds at the gate SF (0.01)") {
    // mirrors the driver's correctness run: the int8-served ANN must clear
    // the same 0.9 recall@10 floor q46 pins for the full-precision path
    val rows = SparkEntry.queries("q89_ann_ivf_int8")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 30, s"expected 10 queries x top-3, got ${rows.length}")
    rows.foreach(r => assert(r.getBoolean(4), "int8 IVF recall@10 verdict is false"))
  }

  test("effectiveTrainRows enforces the 30*k floor; sampler meets it") {
    import spark.implicits._
    // policy k=5000 with the old default cap (1e5) must auto-raise to 150k
    assert(Ivf.effectiveTrainRows(100000L, 5000) == 150000L)
    assert(Ivf.effectiveTrainRows(100000L, 1000) == 100000L) // cap already ample
    assert(Ivf.effectiveTrainRows(0L, 5000) == 0L) // "train on everything" wins
    // the hash sampler's expectation must be >= the floor, not up to 2x
    // below it (a ceil-denominator form keeps only n/2 rows for
    // max < n < 2*max): 160k corpus, 150k floor -> floor-denom keeps all
    val ids = spark.range(160000L).toDF("id")
    val kept = Ivf.trainSample(ids, "id", 150000L, seed = 42L).count()
    assert(kept >= 149000L && kept <= 160000L,
      s"sampler kept $kept of 160000, expected >= ~150000")
    // determinism
    assert(Ivf.trainSample(ids, "id", 150000L, seed = 42L).count() == kept)
    // large-n exactness: no granularity floor — 3.2M rows at a 100k cap
    // keep ~1/32 of the corpus, not 10x the cap
    val big = spark.range(3200000L).toDF("id")
    val keptBig = Ivf.trainSample(big, "id", 100000L, seed = 42L).count()
    assert(keptBig >= 95000L && keptBig <= 115000L,
      s"sampler kept $keptBig of 3.2M at cap 100k")
  }

  test("incremental maintenance: append waves without retraining, search sees both") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // wave 1: corpus < 400; wave 2: the rest, PLUS an exact twin of vec 3
    val wave1 = emb.filter(col("vec_id") < 400L)
    val twin = emb.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 70000L).as("vec_id"), col("embedding"))
    val wave2 = emb.filter(col("vec_id") >= 400L).unionByName(twin)

    // in-memory flavor
    val idx1 = Ivf.buildIndex(wave1, "vec_id", "embedding", nCentroids = 8)
    val idx2 = Ivf.assignToExisting(idx1, wave2, "embedding")
    assert(idx2.centroids.map(_._2.toSeq).toSeq == idx1.centroids.map(_._2.toSeq).toSeq,
      "appending must not retrain")
    val queries = emb.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val got = Ivf.searchIndex(idx2, queries, "query_id", "query_vec", k = 3, nProbe = 8)
      .collect().map(_.getLong(1)).toSet
    assert(got.contains(70003L), s"wave-2 twin missing from $got")
    assert(got.exists(_ < 400L), "wave-1 neighbors must still be served")

    // persisted flavor: same result through the saveIndex layout
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-incr").toString
    Ivf.saveIndex(idx1, dir)
    Ivf.appendToIndex(spark, dir, wave2, "vec_id", "embedding")
    val loaded = Ivf.loadIndex(spark, dir, "vec_id")
    assert(loaded.assigned.count() == emb.count() + 1)
    val got2 = Ivf.searchIndex(loaded, queries, "query_id", "query_vec", k = 3, nProbe = 8)
      .collect().map(_.getLong(1)).toSet
    assert(got2 == got, "persisted append must search like the in-memory union")

    // QUANTIZED layout: appends must land as int8 codes in lists/ + full
    // vectors in refine/ (a full-precision row in lists/ would corrupt
    // every later probe scan)
    val dirQ = java.nio.file.Files.createTempDirectory("graft-ivf-incr-q").toString
    Ivf.saveIndex(idx1, dirQ, quantize = true)
    Ivf.appendToIndex(spark, dirQ, wave2, "vec_id", "embedding")
    val lists = spark.read.parquet(dirQ + "/lists")
    assert(!lists.columns.contains("__vn"), "quantized lists must stay int8-only")
    assert(lists.count() == emb.count() + 1)
    assert(spark.read.parquet(dirQ + "/refine").count() == emb.count() + 1)
    val got3 = Ivf.searchIndexQuantized(spark, dirQ, queries,
      "query_id", "query_vec", "vec_id", k = 3, nProbe = 8)
      .collect().map(_.getLong(1)).toSet
    assert(got3.contains(70003L), s"appended twin missing from quantized search: $got3")

    // replayed append with dedupeIds: BOTH directories stay duplicate-free
    // (each dir anti-joins independently, so a torn first attempt would
    // converge rather than orphan the crashed directory)
    assert(Ivf.appendToIndex(spark, dirQ, wave2, "vec_id", "embedding",
      dedupeIds = true) == 0L)
    assert(spark.read.parquet(dirQ + "/lists").count() == emb.count() + 1)
    assert(spark.read.parquet(dirQ + "/refine").count() == emb.count() + 1)

    // PQ layout: appends re-encode through the SAVED codebooks — lists/
    // stays (id, __pq, __cid) with a non-null code for every row, and the
    // appended vector is served (a __scale/__code append would corrupt
    // the store; this asserts the isPq dispatch)
    val dirP = java.nio.file.Files.createTempDirectory("graft-ivf-incr-pq").toString
    Ivf.saveIndexPq(idx1, dirP)
    Ivf.appendToIndex(spark, dirP, wave2, "vec_id", "embedding")
    val pqLists = spark.read.parquet(dirP + "/lists")
    assert(pqLists.columns.sorted.toSeq == Seq("__cid", "__pq", "vec_id"),
      s"PQ lists schema drifted: ${pqLists.columns.mkString(",")}")
    assert(pqLists.count() == emb.count() + 1)
    assert(pqLists.filter(col("__pq").isNull).count() == 0L)
    assert(Ivf.appendToIndex(spark, dirP, wave2, "vec_id", "embedding",
      dedupeIds = true) == 0L)
    val got4 = Ivf.searchIndexPq(spark, dirP, queries,
      "query_id", "query_vec", "vec_id", k = 3, nProbe = 8)
      .collect().map(_.getLong(1)).toSet
    assert(got4.contains(70003L), s"appended twin missing from PQ search: $got4")
  }

  test("k=2000 build: plan size is O(1) in k and search finds a planted twin") {
    import spark.implicits._
    // the old greatest(struct(typedLit)) unroll hit Janino/plan-size walls
    // at a few hundred centroids; the native expression must build and run
    // at k=2000 with a plan that does not grow with k
    val rnd = new scala.util.Random(7L)
    val base = (0L until 3000L).map(i =>
      (i, List.fill(8)(rnd.nextGaussian().toFloat)))
    val corpus = (base :+ (99999L, base(17)._2)).toDF("vec_id", "embedding")
    val index = Ivf.buildIndex(corpus, "vec_id", "embedding",
      nCentroids = 2000, iters = 1, maxTrainRows = 0L)
    val planStr = index.assigned.queryExecution.analyzed.toString
    assert(planStr.length < 20000,
      s"assignment plan grew with k (len=${planStr.length}) — matrix leaked into the plan")
    assert(index.assigned.count() == 3001)
    assert(index.assigned.select("__cid").distinct().count() > 500,
      "assignments collapsed into few lists")
    // vec 17's exact twin shares its list; top-1 at nProbe=1 must find it
    val queries = corpus.filter(col("vec_id") === 17L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = Ivf.searchIndex(index, queries, "query_id", "query_vec",
      k = 1, nProbe = 1).collect()
    assert(top.length == 1 && top.head.getLong(1) == 99999L,
      s"planted twin not found: ${top.mkString(",")}")
  }

  test("indexStats reports counts and skew for the rebuild decision") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val r = Ivf.indexStats(index).head()
    assert(r.getInt(0) == 8) // n_lists = k, empty lists visible by contrast
    assert(r.getLong(1) >= 2L && r.getLong(1) <= 8L) // n_nonempty
    assert(r.getLong(2) == emb.count()) // every vector counted once
    assert(r.getLong(3) >= r.getLong(4)) // max >= median
    assert(r.getDouble(5) >= 1.0)
    // deterministic drift: append 200 near-copies of one vector — they
    // crowd into a single list, and the skew signal must say "rebuild"
    val src = emb.filter(col("vec_id") === 7L).head().getSeq[Float](1)
    val crowd = (0 until 200).map(i => (90000L + i, src.map(x => x * 1.0001f)))
      .toDF("vec_id", "embedding")
    val drifted = Ivf.assignToExisting(index, crowd, "embedding")
    val rd = Ivf.indexStats(drifted).head()
    assert(rd.getLong(2) == emb.count() + 200)
    assert(rd.getDouble(5) > r.getDouble(5) * 2,
      s"crowded wave did not raise skew: ${rd.getDouble(5)} vs ${r.getDouble(5)}")
  }

  test("rebuildIndex: drifted persisted index rebuilds into a new version") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val v1 = java.nio.file.Files.createTempDirectory("graft-ivf-v1").toString
    val v2 = java.nio.file.Files.createTempDirectory("graft-ivf-v2").toString + "/idx"
    Ivf.saveIndex(Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8),
      v1, quantize = true)
    // drift: 200 vectors from a NOVEL region (one direction + spread wide
    // enough for a retrain to split it over several centroids — frozen
    // birth centroids funnel the whole region into ~one list), plus a
    // twin of vec 3
    val rnd = new scala.util.Random(17L)
    val base = Array.fill(64)(rnd.nextGaussian())
    val crowd = ((0 until 200).map { i =>
      (90000L + i, base.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
    } :+ ((80000L, emb.filter(col("vec_id") === 3L).head().getSeq[Float](1))))
      .toDF("vec_id", "embedding")
    Ivf.appendToIndex(spark, v1, crowd, "vec_id", "embedding")
    val skewBefore = Ivf.indexStats(Ivf.loadIndex(spark, v1, "vec_id"))
      .head().getDouble(5)

    val rebuilt = Ivf.rebuildIndex(spark, v1, v2, "vec_id", nCentroids = 16)
    assert(rebuilt.centroids.length == 16)
    val stats = Ivf.indexStats(Ivf.loadIndex(spark, v2, "vec_id")).head()
    assert(stats.getLong(2) == emb.count() + 201, "rebuild must keep every vector")
    assert(stats.getDouble(5) < skewBefore,
      s"rebuild did not reduce skew: ${stats.getDouble(5)} vs $skewBefore")
    // quantize mode preserved; the rebuilt store serves correctly
    assert(spark.read.parquet(v2 + "/lists").columns.contains("__code"))
    val queries = emb.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val got = Ivf.searchIndexQuantized(spark, v2, queries,
      "query_id", "query_vec", "vec_id", k = 3, nProbe = 16)
      .collect().map(_.getLong(1)).toSet
    assert(got.contains(80000L), s"twin missing after rebuild: $got")
  }

  test("Ivf.topK leaves no lingering cached RDDs after its action") {
    val emb = Tables.embeddings(spark, sf)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val queries = emb.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
      k = 5, nCentroids = 4, nProbe = 2).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("semantic dedup: planted true near-dups all found, precision exact") {
    import spark.implicits._
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    // plant a perturbed copy of 20 vectors (cosine vs source ≈ 0.999 —
    // the regime SemDeDup is specified for)
    val rnd = new scala.util.Random(5L)
    val sources = emb.filter(col("vec_id") < 20L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = sources.map { case (id, v) =>
      (id + 10000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq)
    }.toSeq.toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(planted)

    val pairs = Similarity.semanticNearDupPairs(corpus, "vec_id", "embedding",
      nClusters = 16, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall on TRUE near-duplicates: a copy at cosine ~0.999 lands in its
    // source's cluster (same nearest centroid) — all 20 planted pairs found
    val plantedPairs = sources.map { case (id, _) => (id, id + 10000L) }.toSet
    assert(plantedPairs.subsetOf(pairs),
      s"missed planted pairs: ${plantedPairs -- pairs}")
    // precision: every reported pair is exactly >= the threshold
    val exact = Similarity.cosineNearDupPairsExact(corpus, "vec_id", "embedding",
      minCosine = 0.95).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(exact), "semantic pairs must be exact-verified")
    // greedy drop removes exactly the larger id of each pair
    val survivors = Similarity.dropSemanticDuplicates(corpus, "vec_id", "embedding",
      nClusters = 16, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pairs.forall { case (_, b) => !survivors.contains(b) })
    assert(survivors.size == 520 - pairs.map(_._2).size)
  }

  test("semDeDupDrops: the paper's keep-rule retains the far-from-centroid exemplar") {
    import spark.implicits._
    import graft.ops.Similarity
    // one cluster of three mutual near-dups at 0°, 12°, 20° plus an
    // unrelated 90° vector. k=1 → centroid = normalized mean of ALL FOUR
    // ≈ 28.0°, so centroid cosines rank v3 (8.0° away) > v2 (16.0°) >
    // v1 (28.0°). Pairs all clear 0.9 (cos 20° = 0.94): (v1,v2) drops
    // v2, (v2,v3) drops v3, (v1,v3) drops v3 → ONLY v1, the
    // cluster-edge exemplar, survives the dup group; v4 is untouched
    // (its pairs sit at cos 70°..90° < 0.9).
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = Seq((1L, v(0)), (2L, v(12)), (3L, v(20)), (4L, v(90)))
      .toDF("vec_id", "embedding")
    val drops = Similarity.semDeDupDrops(corpus, "vec_id", "embedding",
      nClusters = 1, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drops == Set((2L, 1L), (3L, 2L), (3L, 1L)), s"drops: $drops")
    val kept = Similarity.semDeDup(corpus, "vec_id", "embedding",
      nClusters = 1, minCosine = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"kept: $kept")
    // exact clones tie on centroid cosine → the larger id drops, and
    // co-clustering is guaranteed (assignment is a function of the vector)
    val clones = corpus.unionByName(
      Seq((101L, v(0)), (104L, v(90))).toDF("vec_id", "embedding"))
    val cd = Similarity.semDeDupDrops(clones, "vec_id", "embedding",
      nClusters = 2, minCosine = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cd == Set((101L, 1L), (104L, 4L)), s"clone drops: $cd")
  }

  test("semantic dedup stress floor: moderate-similarity recall documented") {
    // at the q31 stress threshold (0.4 — NOT near-duplicates, just
    // moderately similar random vectors) cross-cluster splits are expected;
    // the floor documents the measured trade (0.37-0.46 at k∈{8..32})
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Similarity.semanticNearDupPairs(emb, "vec_id", "embedding",
      nClusters = 32, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact))
    val recall = sem.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, f"stress recall $recall%.3f below documented floor")
  }

  test("approx sketches within tolerance of exact") {
    // q47 computes the tolerance verdicts in-query (exact stats + in-band
    // booleans — the oracle-expressible form); the test asserts every
    // group's sketches landed inside their provable error bands AND that
    // the exact side is sane against an independent spelling.
    val rows = SparkEntry.queries("q47_approx_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getLong(1) > 0, s"$k exact_users")
      assert(r.getBoolean(2), s"$k HLL++ outside ±5% of exact distinct")
      assert(r.getBoolean(3), s"$k approx p50 outside exact [q0.49, q0.51] band")
    }
    val exact = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("tombstone deletion: immediate in every serving path, purge folds it physically") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    Ivf.saveIndex(index, dir, quantize = true)

    val before = Ivf.searchIndexQuantized(spark, dir, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // delete every id the first sweep returned for query 0 — the
    // strongest adversarial set: all of them must vanish
    val dead = before.filter(_._1 == 0L).map(_._2).toSet
    assert(dead.nonEmpty)
    import spark.implicits._
    Ivf.deleteFromIndex(dir, dead.toSeq.toDF("vec_id"), "vec_id")

    val after = Ivf.searchIndexQuantized(spark, dir, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after.forall(p => !dead.contains(p._2)),
      "tombstoned ids must never surface from the quantized path")
    assert(after.count(_._1 == 0L) == 5,
      "k results still come back — live candidates fill the gap")
    // the loaded-index (exact) path excludes them too, and stats shrink
    val loaded = Ivf.loadIndex(spark, dir, "vec_id")
    assert(loaded.assigned.filter(col("vec_id").isin(dead.toSeq: _*)).count() == 0)
    val nLive = emb.count() - dead.size

    // purge: physical fold, only the touched lists rewritten
    val rewrites = Ivf.purgeDeleted(spark, dir, "vec_id")
    assert(rewrites >= 2, s"expected lists+refine rewrites, got $rewrites")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "/tombstones")),
      "purge clears the tombstone plane")
    val lists = spark.read.parquet(dir + "/lists")
    assert(lists.filter(col("vec_id").isin(dead.toSeq: _*)).count() == 0 &&
      lists.count() == nLive, "deleted rows physically gone from lists")
    val refine = spark.read.parquet(dir + "/refine")
    assert(refine.filter(col("vec_id").isin(dead.toSeq: _*)).count() == 0 &&
      refine.count() == nLive, "deleted rows physically gone from refine")
    val postPurge = Ivf.searchIndexQuantized(spark, dir, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(postPurge.toSeq == after.toSeq,
      "purge is physical bookkeeping only — search results are identical")

    // after purge the id is re-insertable (the documented delete/re-add
    // contract): append one deleted vector back, search can see it again
    val back = emb.filter(col("vec_id") === dead.head)
    Ivf.appendToIndex(spark, dir, back, "vec_id", "embedding")
    val again = Ivf.searchIndexQuantized(spark, dir, queries,
      "query_id", "query_vec", "vec_id", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again.contains((0L, dead.head)),
      "query 0's former top hit returns after purge + re-append")
    val empty = Ivf.purgeDeleted(spark, dir, "vec_id")
    assert(empty == 0, "no tombstones -> purge is a no-op")
  }

  test("purgeDeleted crash recovery: parked lists are recovered BEFORE the touched scan; a half-purged layout converges") {
    val emb = Tables.embeddings(spark, sf)
    import spark.implicits._
    val fsConf = spark.sessionState.newHadoopConf()

    // scenario A: a list parked by a crashed swap (live dir missing) holds
    // a tombstoned row — recovery must run before the touched computation
    // or the restored rows would survive the purge
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivf-crashA").toString
    Ivf.saveIndex(Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8),
      dirA, quantize = true)
    val victim = spark.read.parquet(dirA + "/lists").select("vec_id", "__cid")
      .head()
    val (vid, vcid) = (victim.getLong(0), victim.getInt(1))
    Ivf.deleteFromIndex(dirA, Seq(vid).toDF("vec_id"), "vec_id")
    val fs = new org.apache.hadoop.fs.Path(dirA).getFileSystem(fsConf)
    val live = new org.apache.hadoop.fs.Path(dirA + s"/lists/__cid=$vcid")
    val parked = new org.apache.hadoop.fs.Path(
      dirA + s"/lists/_graft_compact_old___cid=$vcid")
    require(fs.rename(live, parked), "test setup: park failed")
    Ivf.purgeDeleted(spark, dirA, "vec_id")
    assert(spark.read.parquet(dirA + "/lists")
      .filter(col("vec_id") === vid).count() == 0,
      "the recovered list's tombstoned row must still be purged")
    assert(spark.read.parquet(dirA + "/refine")
      .filter(col("vec_id") === vid).count() == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirA + "/tombstones")))

    // scenario B: crash landed AFTER the lists pass — lists are already
    // clean, refine still dirty, tombstones present. A lists-derived
    // touched set would be empty and strand refine forever; the per-dir
    // set must clean it
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivf-crashB").toString
    Ivf.saveIndex(Ivf.buildIndex(emb, "vec_id", "embedding", nCentroids = 8),
      dirB, quantize = true)
    val vid2 = spark.read.parquet(dirB + "/lists").select("vec_id")
      .head().getLong(0)
    Ivf.deleteFromIndex(dirB, Seq(vid2).toDF("vec_id"), "vec_id")
    // simulate the completed lists pass: rewrite lists without the id
    val cleanLists = spark.read.parquet(dirB + "/lists")
      .filter(col("vec_id") =!= vid2).persist()
    cleanLists.count()
    cleanLists.write.mode("overwrite").partitionBy("__cid")
      .parquet(dirB + "/lists_clean")
    val fsB = new org.apache.hadoop.fs.Path(dirB).getFileSystem(fsConf)
    fsB.delete(new org.apache.hadoop.fs.Path(dirB + "/lists"), true)
    require(fsB.rename(new org.apache.hadoop.fs.Path(dirB + "/lists_clean"),
      new org.apache.hadoop.fs.Path(dirB + "/lists")))
    cleanLists.unpersist()
    assert(spark.read.parquet(dirB + "/refine")
      .filter(col("vec_id") === vid2).count() == 1, "setup: refine dirty")
    Ivf.purgeDeleted(spark, dirB, "vec_id")
    assert(spark.read.parquet(dirB + "/refine")
      .filter(col("vec_id") === vid2).count() == 0,
      "refine must be purged even when lists came back clean")
    assert(!fsB.exists(new org.apache.hadoop.fs.Path(dirB + "/tombstones")))
  }

  test("signBits: hand-packed words incl. a >64-dim second word; " +
    "hammingDistance exact") {
    import spark.implicits._
    // 3 dims: signs(0.5, -1, 2) -> bits 0,2 -> word0 = 5
    val w3 = Seq(Tuple1(Seq(0.5f, -1.0f, 2.0f))).toDF("v")
      .select(Similarity.signBits(col("v"))).head().getSeq[Long](0)
    assert(w3 == Seq(5L), s"3-dim words: $w3")
    // 70 dims, only dims 1 and 69 negative: word0 = ~bit1, word1 = ~bit5
    val v70 = (0 until 70).map(i => if (i == 1 || i == 69) -1.0f else 1.0f)
    val w70 = Seq(Tuple1(v70)).toDF("v")
      .select(Similarity.signBits(col("v"))).head().getSeq[Long](0)
    assert(w70 == Seq(-1L ^ (1L << 1), (1L << 6) - 1 - (1L << 5)),
      s"70-dim words: $w70")
    val d = Seq((Seq(0.5f, -1.0f, 2.0f), Seq(-0.5f, -1.0f, 2.0f)))
      .toDF("a", "b")
      .select(Similarity.hammingDistance(
        Similarity.signBits(col("a")), Similarity.signBits(col("b"))))
      .head().getLong(0)
    assert(d == 1L, s"hamming: $d")
    // empty vector raises the NAMED error, not "array indices start at 1"
    val ee = intercept[Exception] {
      Seq(Tuple1(Seq.empty[Float])).toDF("v")
        .select(Similarity.signBits(col("v"))).collect()
    }
    assert(ee.getMessage.contains("non-empty"), ee.getMessage)
    // mismatched word-array lengths raise instead of scoring the prefix
    val em = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(Similarity.hammingDistance(col("a"), col("b"))).collect()
    }
    assert(em.getMessage.contains("differ in"), em.getMessage)
  }

  test("hammingSearch: generous rerank == exact cosine top-k; recall " +
    "reasonable at rerankFactor 4") {
    import spark.implicits._
    // deterministic 80-dim gaussian vectors (two words); corpus plants
    // near-neighbors of each query (query + small noise) so the exact
    // top-k is meaningful and sign patterns genuinely correlate
    def gauss(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(80)(r.nextGaussian().toFloat)
    }
    val q1 = gauss(7001); val q2 = gauss(7002)
    def near(q: Seq[Float], seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      q.map(x => x + 0.3f * r.nextGaussian().toFloat)
    }
    def vecOf(i: Int): Seq[Float] =
      if (i <= 10) near(q1, i) else if (i <= 20) near(q2, i) else gauss(i)
    val corpus = (1 to 300).map(i => (i.toLong, vecOf(i))).toDF("id", "v")
    val queries = Seq((1001L, q1), (1002L, q2)).toDF("qid", "qv")
    // brute-force exact cosine reference, ties by id
    def ref(q: Seq[Float], k: Int): Seq[Long] = {
      def dot(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      (1 to 300).map { i =>
        val c = vecOf(i)
        (i.toLong, dot(c, q) / (math.sqrt(dot(c, c)) * math.sqrt(dot(q, q))))
      }.sortBy(t => (-t._2, t._1)).take(k).map(_._1)
    }
    // rerankFactor spanning the corpus: shortlist = everything -> the
    // re-rank IS brute force, result must equal the exact top-k
    val full = Similarity.hammingSearch(corpus, "id", "v", queries,
        "qid", "qv", k = 5, rerankFactor = 60)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(full(1001L) == ref(q1, 5), s"q1: ${full(1001L)}")
    assert(full(1002L) == ref(q2, 5), s"q2: ${full(1002L)}")
    // the cheap shortlist: recall@5 of at least 2/5 per query at
    // rerankFactor 4 (sign agreement is a monotone angle proxy)
    val fast = Similarity.hammingSearch(corpus, "id", "v", queries,
        "qid", "qv", k = 5, rerankFactor = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(fast(1001L).intersect(ref(q1, 5).toSet).size >= 4,
      s"recall q1: ${fast(1001L)}")
    assert(fast(1002L).intersect(ref(q2, 5).toSet).size >= 4,
      s"recall q2: ${fast(1002L)}")
  }
}
