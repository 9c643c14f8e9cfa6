package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-conscious distributed plan:
  *
  *   - exact: hash-groupBy on a normalized fingerprint (one shuffle on the
  *     fingerprint — the minimum possible);
  *   - MinHash + LSH banding: shingle → k minhashes → b bands → bucket join.
  *     Candidate generation shuffles on (band, bandHash), NEVER all-pairs;
  *   - SimHash: 64-bit sign-sketch per document, near-dups = small Hamming
  *     distance, candidates via 16-bit chunk banding (Charikar'02 /
  *     Manku et al. WWW'07 pattern);
  *   - n-gram Jaccard: exact pairwise similarity but only over
  *     LSH/shingle-sharing candidates, with a document-frequency cap so one
  *     ubiquitous shingle can't create a quadratic hot key (skew guard).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per normalized-text group.
    * Equivalent to dropDuplicates but with a deterministic survivor.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextOps.fingerprintMd5(col(textCol))
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__fp")
  }

  /** MinHash signature: k-minima over n-gram hashes, computed by the native
    * kernels (graft.functions.{ShingleHashes, MinHashSignature}) in ONE
    * projection per document — no shingle strings, no explode, no groupBy,
    * NO SHUFFLE. At corpus scale signature computation is embarrassingly
    * parallel; only candidate banding shuffles. Documents with no shingles
    * (fewer than n tokens) are excluded, matching set semantics.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    import graft.functions.ArrayMath
    df.select(col(idCol),
        ArrayMath.shingleHashes(
          TextOps.tokens(TextOps.normalized(col(textCol))), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), ArrayMath.minhashSignature(col("__sh"), numHashes).as("signature"))
  }

  /** LSH banding: b bands of r rows each (k = b*r); a pair collides if any
    * band hashes equal. Returns candidate pairs (idA < idB) with the
    * estimated Jaccard = fraction of equal minhashes.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 32, shingleSize: Int = 3,
                          bands: Int = 8, minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)

    // skinny banding: only (id, band, bucket) shuffles for candidate
    // generation; the 32-long signatures are joined back after pair dedup
    // (AQE broadcasts the signature table when small)
    val banded = sigs.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b), slice(col("signature"), b * rows + 1, rows)).as("bucket"))
      }: _*)).as("__b"))
      .select(col(idCol), col("__b.band"), col("__b.bucket"))

    val candidates = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col(idCol).as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several bands

    // codegen'd equality count (graft.functions.ArrayEqualCount) — this
    // runs once per candidate pair, the hot loop of the operator
    val est = graft.functions.ArrayMath.arrayEqCount(col("sig_a"), col("sig_b"))
      .cast("double") / numHashes
    candidates
      .join(sigs.select(col(idCol).as("id_a"), col("signature").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("signature").as("sig_b")), "id_b")
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** End-to-end near-dedup: drop every document that has a near-duplicate
    * with a smaller id (the standard greedy survivor rule — for a chain
    * A~B~C with A<B<C, A survives). One anti-join against the candidate
    * pairs; composes exact + MinHash stages.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 32, shingleSize: Int = 3,
                         bands: Int = 16, minJaccard: Double = 0.8): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, numHashes, shingleSize,
      bands, minJaccard)
    df.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit signed counts of token
    * hashes, sign → bit (graft.functions.SimHash64 kernel). One projection
    * per document — no explode, no shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.ArrayMath
    df.select(col(idCol),
      ArrayMath.simhash64(
        ArrayMath.shingleHashes(
          TextOps.tokens(TextOps.normalized(col(textCol))), 1)).as("simhash"))
  }

  /** SimHash near-dups: Hamming distance ≤ maxDistance, candidates from
    * 16-bit chunk banding (any equal chunk → candidate; complete for
    * maxDistance ≤ 3 by pigeonhole over 4 chunks).
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxDistance: Int = 3): DataFrame = {
    val sigs = simhash(df, idCol, textCol)
    val chunked = sigs.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), expr(s"(simhash >> ${c * 16}) & 65535").as("bucket"))
      }: _*)).as("__c"))
      .select(col(idCol), col("simhash"), col("__c.chunk"), col("__c.bucket"))
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("chunk"), col("bucket"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("chunk"), col("bucket"))
    a.join(b, Seq("chunk", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard over shingle-sharing candidates. `maxDocFreq`
    * drops shingles present in more than that many documents before the
    * candidate join — the skew guard that keeps one ubiquitous shingle from
    * exploding into a quadratic hot partition at corpus scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, minJaccard: Double = 0.3,
                        maxDocFreq: Long = 1000L): DataFrame = {
    import graft.functions.ArrayMath
    // shingle IDENTITY is its 64-bit hash (collisions negligible): the join
    // shuffles longs, not strings; per-doc set semantics via array_distinct
    // (no distinct shuffle); set sizes computed in the same projection
    val hashed = df.select(col(idCol).as("id"),
      array_distinct(ArrayMath.shingleHashes(
        TextOps.tokens(TextOps.normalized(col(textCol))), shingleSize)).as("__shs"))
    val shingled = hashed.select(col("id"), explode(col("__shs")).as("sh"))
    val sizes = hashed.select(col("id"), size(col("__shs")).cast("long").as("sz"))
    val rare = shingled.join(
      shingled.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq),
      "sh")
    val common = rare.select(col("id").as("id_a"), col("sh"))
      .join(rare.select(col("id").as("id_b"), col("sh")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    // sizes is one row per document — scales with the corpus, so a plain
    // shuffle join (AQE will still broadcast it when it is actually small)
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
