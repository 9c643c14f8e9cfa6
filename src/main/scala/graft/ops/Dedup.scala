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

  /** MinHash signature: k independent 64-bit min-hashes over distinct token
    * shingles. One explode + one groupBy (shuffle on id) — signature
    * computation is linear in corpus size.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    val shingled = df
      .select(col(idCol), explode(TextOps.tokenShingles(col(textCol), shingleSize)).as("__sh"))
      .dropDuplicates(idCol, "__sh")
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("__sh"))).as(s"__mh$i"))
    shingled.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"__mh$i")): _*).as("signature"))
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

    val banded = sigs.select(col(idCol), col("signature"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b), slice(col("signature"), b * rows + 1, rows)).as("bucket"))
      }: _*)).as("__b"))
      .select(col(idCol), col("signature"), col("__b.band"), col("__b.bucket"))

    val a = banded.select(col(idCol).as("id_a"), col("signature").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("signature").as("sig_b"),
      col("band"), col("bucket"))
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x) / numHashes

    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several bands
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit signed counts of token
    * hashes, sign → bit. Explode + one 64-column groupBy agg — all codegen.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenized = df.select(col(idCol),
      explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitAggs = (0 until 64).map { i =>
      sum(when(expr(s"(__h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"__b$i")
    }
    val packed = (0 until 64).map { i =>
      when(col(s"__b$i") > 0, expr(s"shiftleft(1L, $i)")).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    tokenized.groupBy(col(idCol))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col(idCol), packed.as("simhash"))
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
    val shingled = df
      .select(col(idCol).as("id"), explode(TextOps.tokenShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
    val sizes = shingled.groupBy("id").agg(count(lit(1)).as("sz"))
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
