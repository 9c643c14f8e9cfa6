package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for bench investigation (not part of the library API). */
object ProbeQ31 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = if (args.nonEmpty) args(0) else "q31_cosine_near_dup"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
