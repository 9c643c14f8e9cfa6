package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: print a condensed EXECUTED plan for named queries —
  * the round protocol's `.explain` audit loop without a REPL.
  * Usage: Test/runMain graft.tools.ProbePlan q128 q129
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Exchange", "TakeOrdered", "Window", "Join",
      "Scan parquet", "HashAggregate", "Sort ", "CartesianProduct", "Generate")
    graft.SparkEntry.queries
      .filter { case (n, _) => args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val df = fn(spark, "/root/testdata/sf0.01")
        df.collect() // finalize AQE so the executed plan is the real one
        println(s"===== $name =====")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => interesting.exists(l.contains))
          .map(_.take(160)).mkString("\n"))
      }
    spark.stop()
  }
}
