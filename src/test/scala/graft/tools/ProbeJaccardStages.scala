package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does guarded ngramJaccardPairs time go at t=0.2? */
object ProbeJaccardStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.ArrayMath
    import graft.ops.TextOps
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    val minJaccard = 0.2

    val hashed = docs.select(col("doc_id").as("id"),
      array_distinct(ArrayMath.shingleHashes(
        TextOps.tokens(TextOps.normalized(col("text"))), 3)).as("__shs"))
      .filter(size(col("__shs")) > 0).localCheckpoint(true)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val full = hashed.select(col("id"), explode(col("__shs")).as("sh"))
      val dfreq = full.groupBy("sh").agg(count(lit(1)).as("__df"))
      val prefix = full.join(dfreq, "sh")
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("__df"), col("sh")))).as("__ord"))
        .withColumn("__sz", size(col("__ord")))
        .select(col("id"), col("__sz"),
          explode(expr("transform(slice(__ord, 1, cast(__sz - greatest(1L, " +
            s"ceil($minJaccard * __sz) - 1L) + 1L as int)), x -> x.sh)")).as("sh"))
      val prefixCp = time("prefix build")(prefix.localCheckpoint(true))
      println(s"prefix rows: ${prefixCp.count()}")
      val candidates = prefixCp.select(col("sh"), col("id").as("id_a"), col("__sz").as("__sz_a"))
        .join(prefixCp.select(col("sh"), col("id").as("id_b"), col("__sz").as("__sz_b")), "sh")
        .filter(col("id_a") < col("id_b"))
        .filter(col("__sz_b") >= greatest(lit(1L), ceil(lit(minJaccard) * col("__sz_a")) - 1L) &&
          col("__sz_a") >= greatest(lit(1L), ceil(lit(minJaccard) * col("__sz_b")) - 1L))
        .select(col("id_a"), col("id_b"), col("__sz_a"), col("__sz_b"))
        .dropDuplicates("id_a", "id_b")
      val candCp = time("candidate join")(candidates.localCheckpoint(true))
      println(s"candidates: ${candCp.count()}")
      val verified = candCp
        .join(hashed.select(col("id").as("id_a"), col("__shs").as("__shs_a")), "id_a")
        .join(hashed.select(col("id").as("id_b"), col("__shs").as("__shs_b")), "id_b")
        .withColumn("__common", size(array_intersect(col("__shs_a"), col("__shs_b"))))
        .filter(col("__common").cast("double") /
          (col("__sz_a") + col("__sz_b") - col("__common")).cast("double") >= minJaccard)
      val n = time("verify")(verified.count())
      println(s"pairs: $n")
    }
    spark.stop()
  }
}
