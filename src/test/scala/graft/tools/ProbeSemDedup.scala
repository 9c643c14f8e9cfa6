package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: SemDeDup recall vs exact pairs at fixture scale. */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity
    for (sf <- Seq("sf0.01"); k <- Seq(8, 16, 32)) {
      val emb = graft.Tables.embeddings(spark, s"/root/testdata/$sf")
      val exact = Similarity.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sem = Similarity.semanticNearDupPairs(emb, "vec_id", "embedding", k, 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = if (exact.isEmpty) 1.0 else sem.intersect(exact).size.toDouble / exact.size
      println(s"$sf k=$k exact=${exact.size} sem=${sem.size} " +
        f"precisionOk=${sem.subsetOf(exact)} recall=$recall%.3f")
    }
    spark.stop()
  }
}
