package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (the reference's warehouse-SQL surface, SURVEY.md §3.3):
  * register every fixture table as a temp view and hand the text to Spark
  * SQL's parse→analyze→optimize→execute lifecycle. Users of the reference's
  * `INSERT INTO … SELECT` path drive the same queries here.
  */
object Sql {

  /** Register all fixture tables of `sfDir` as temp views (plus graft's
    * native functions) and return a runner.
    */
  def session(spark: SparkSession, sfDir: String): String => DataFrame = {
    graft.functions.ArrayMath.register(spark)
    Tables.names.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    sql => spark.sql(sql)
  }
}
