package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: q63 cost split — jaccard pair generation vs CC rounds. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    (1 to 2).foreach { round =>
      var t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.ngramJaccardPairs(
        graft.Tables.documents(spark, dir), "doc_id", "text",
        shingleSize = 3, minJaccard = 0.2).localCheckpoint(true)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cc = graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
      val nRows = cc.count()
      val tCC = (System.nanoTime() - t0) / 1e9
      println(f"round $round: pairs=$nPairs in $tPairs%.2f s; cc rows=$nRows in $tCC%.2f s")
    }
    spark.stop()
  }
}
