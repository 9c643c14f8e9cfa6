package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does minhash/ngram-jaccard time go at sf0.1. */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.ops.{Dedup, TextOps}
    time("explode shingles count") {
      println("  shingle rows: " + docs.select(explode(TextOps.tokenShingles(col("text"), 3))).count())
    }
    time("minhash signatures (noop)") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
        .write.mode("overwrite").format("noop").save()
    }
    time("minhash signatures again") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
        .write.mode("overwrite").format("noop").save()
    }
    time("full near-dup pairs") {
      println("  pairs: " + Dedup.minhashNearDupPairs(docs, "doc_id", "text", 32, 3, 16, 0.3).count())
    }
    // candidate volume before jaccard-estimate
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until 16).map { b =>
        struct(lit(b).as("band"), xxhash64(lit(b), slice(col("signature"), b * 2 + 1, 2)).as("bucket"))
      }: _*)).as("__b"))
      .select(col("doc_id"), col("__b.band"), col("__b.bucket"))
    time("candidate pair count") {
      val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
      println("  candidates: " + a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b")).count())
    }
    // ngram side
    val shingled = docs.select(col("doc_id").as("id"),
      explode(TextOps.tokenShingles(col("text"), 3)).as("sh")).distinct()
    time("ngram distinct shingles") { println("  rows: " + shingled.count()) }
    time("ngram raw candidate volume") {
      println("  pairs: " + shingled.select(col("id").as("id_a"), col("sh"))
        .join(shingled.select(col("id").as("id_b"), col("sh")), "sh")
        .filter(col("id_a") < col("id_b")).count())
    }
    spark.stop()
  }
}
