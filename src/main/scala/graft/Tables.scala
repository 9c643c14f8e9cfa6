package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet fixture tables
  * (`TESTDATA.md`). One place encapsulates every read-side quirk so query
  * builders stay declarative.
  *
  * Scale note: each loader is a plain parquet scan — Catalyst pushes filters
  * and prunes columns into the scan, and the file source splits by
  * `spark.sql.files.maxPartitionBytes`, so the same code paths hold whether
  * the directory is 6k rows (sf0.001) or 100 TB on a 1000-executor cluster.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw scan of one fixture table. Also ensures graft's native functions
    * are registered on the session (idempotent), since every query builder
    * enters through here.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.ArrayMath.register(spark)
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS,false),
    * which Spark rejects by default ([PARQUET_TYPE_ILLEGAL]; FIXTURES.md §F2).
    * Read nanos as a long and expose BOTH the raw nanos (`ts_ns`, exact — used
    * for bucketing arithmetic that must hash-match the oracle) and a derived
    * micro-precision timestamp (`ts`).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
