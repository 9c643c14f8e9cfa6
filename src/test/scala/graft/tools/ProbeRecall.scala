package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Ivf, Similarity}

/** Scratch probe: measures IVF and LSH ANN recall vs brute force at sf0.01
  * across parameter settings (not part of the library API).
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf).cache()
    val nQ = 10
    val k = 10
    val queries = emb.filter(col("vec_id") < nQ.toLong)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val truth = (0L until nQ.toLong).flatMap { q =>
      val qv = emb.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding")).as("query_vec"))
      Similarity.bruteTopK(emb.filter(col("vec_id") =!= q), "vec_id", "embedding", qv, k)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    println(s"truth pairs: ${truth.size}")

    for ((nc, np) <- Seq((8,6),(8,7))) {
      if (np <= nc) {
        val ivf = Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
          k = k, nCentroids = nc, nProbe = np)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val r = (ivf & truth).size.toDouble / truth.size
        println(f"IVF nCentroids=$nc nProbe=$np recall=$r%.3f")
      }
    }
    for ((nb, nt) <- Seq((3,8),(3,12),(3,16),(4,16),(4,24),(4,32))) {
      val ann = Similarity.annTopK(emb, "vec_id", "embedding", queries,
        "query_id", "query_vec", k = k, nBits = nb, nTables = nt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = (ann & truth).size.toDouble / truth.size
      println(f"LSH nBits=$nb nTables=$nt recall=$r%.3f")
    }
    spark.stop()
  }
}
