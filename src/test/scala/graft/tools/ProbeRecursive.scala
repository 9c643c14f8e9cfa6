package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: does Spark 4.1.2 execute WITH RECURSIVE? */
object ProbeRecursive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5
          |)
          |SELECT * FROM t ORDER BY n""".stripMargin)
      df.show()
      df.explain("formatted")
      println("RECURSIVE OK")
    } catch {
      case e: Throwable => println(s"RECURSIVE UNSUPPORTED: ${e.getMessage.take(400)}")
    }
    spark.stop()
  }
}
