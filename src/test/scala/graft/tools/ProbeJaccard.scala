package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextOps

/** Scratch probe: q27 plan-variant timing at sf0.1. */
object ProbeJaccard {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    import graft.functions.ArrayMath
    val t = 0.2

    def hashedDf: DataFrame = docs.select(col("doc_id").as("id"),
      sort_array(array_distinct(ArrayMath.shingleHashes(
        TextOps.tokens(TextOps.normalized(col("text"))), 3))).as("__shs"))
      .filter(size(col("__shs")) > 0)

    def alphaSafe(m: Column) = greatest(lit(1L), ceil(lit(t) * m) - 1L)

    // variant A: prefix candidates + array-intersect verification (current)
    def variantA(): Long = {
      val hashed = hashedDf
      val prefix = hashed.withColumn("__sz", size(col("__shs")))
        .select(col("id"), col("__sz"),
          explode(slice(col("__shs"), lit(1),
            (col("__sz") - alphaSafe(col("__sz")) + 1L).cast("int"))).as("sh"))
      val candidates = prefix.select(col("sh"), col("id").as("id_a"), col("__sz").as("__sz_a"))
        .join(prefix.select(col("sh"), col("id").as("id_b"), col("__sz").as("__sz_b")), "sh")
        .filter(col("id_a") < col("id_b"))
        .filter(col("__sz_b") >= alphaSafe(col("__sz_a")) &&
          col("__sz_a") >= alphaSafe(col("__sz_b")))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      candidates
        .join(hashed.select(col("id").as("id_a"), col("__shs").as("__shs_a")), "id_a")
        .join(hashed.select(col("id").as("id_b"), col("__shs").as("__shs_b")), "id_b")
        .withColumn("__common", size(array_intersect(col("__shs_a"), col("__shs_b"))))
        .withColumn("jaccard", col("__common").cast("double") /
          (size(col("__shs_a")) + size(col("__shs_b")) - col("__common")).cast("double"))
        .filter(col("jaccard") >= t)
        .count()
    }

    // variant B: prefix candidates + pair-count verification on the FULL
    // index via groupBy — exact counts, skinny rows all the way
    def variantB(): Long = {
      val hashed = hashedDf
      val full = hashed.select(col("id"), size(col("__shs")).as("__sz"),
        explode(col("__shs")).as("sh"))
      val common = full.select(col("sh"), col("id").as("id_a"), col("__sz").as("__sz_a"))
        .join(full.select(col("sh"), col("id").as("id_b"), col("__sz").as("__sz_b")), "sh")
        .filter(col("id_a") < col("id_b"))
        .filter(col("__sz_b") >= alphaSafe(col("__sz_a")) &&
          col("__sz_a") >= alphaSafe(col("__sz_b")))
        .groupBy(col("id_a"), col("id_b"), col("__sz_a"), col("__sz_b"))
        .agg(count(lit(1)).as("__common"))
      common
        .withColumn("jaccard", col("__common").cast("double") /
          (col("__sz_a") + col("__sz_b") - col("__common")).cast("double"))
        .filter(col("jaccard") >= t)
        .count()
    }

    (1 to 3).foreach { i =>
      time(s"A run $i")(println(s"  A pairs=${variantA()}"))
      time(s"B run $i")(println(s"  B pairs=${variantB()}"))
    }
    spark.stop()
  }
}
