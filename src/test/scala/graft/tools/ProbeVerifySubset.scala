package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch probe: Verify for a subset of queries (fast oracle iteration).
  * Usage: Test/runMain graft.tools.ProbeVerifySubset out q73 q74 ...
  * Then: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/<out>
  */
object ProbeVerifySubset {
  def main(args: Array[String]): Unit = {
    val outDir = s"/tmp/${args.head}"
    val prefixes = args.tail
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = graft.SparkEntry.queries.filter { case (n, _) =>
      prefixes.exists(n.startsWith)
    }
    selected.foreach { case (name, fn) =>
      fn(spark, "/root/testdata/sf0.01").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"dumped $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => prefixes.exists(k.startsWith) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
