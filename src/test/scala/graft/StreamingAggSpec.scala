package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAggregates

/** Streaming aggregations driven synchronously from the events fixture:
  * a memory-sink streaming query over the same parquet must agree with the
  * identical batch computation (same-code-both-modes is the design claim).
  */
class StreamingAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // events parquet raw schema (ts is INT64 nanos read as bigint)
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // the streaming file source wants a DIRECTORY; stage the fixture into one
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamEvents: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(streamDir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("watermarked hourly window agg: streaming == batch") {
    val streaming = runToMemory(
      StreamingAggregates.hourlyTypeAgg(streamEvents), "hourly_stream", "append")
    val batch = StreamingAggregates.hourlyTypeAgg(Tables.events(spark, sf))
    // append mode emits only windows closed by the watermark; every emitted
    // row must match the batch result exactly
    val b = batch.collect().map(_.toSeq).toSet
    val s = streaming.collect().map(_.toSeq).toSet
    assert(s.nonEmpty)
    assert(s.subsetOf(b))
    // all-but-the-last-hour windows must have been emitted
    assert(s.size >= b.size - 10)
  }

  test("session windows emit per-user sessions") {
    val streaming = runToMemory(
      StreamingAggregates.userSessions(streamEvents), "sessions_stream", "append")
    assert(streaming.count() > 0)
    // session invariant: end > start, n_events >= 1
    assert(streaming.filter(col("sess_end") <= col("sess_start")).isEmpty)
    assert(streaming.filter(col("n_events") < 1).isEmpty)
  }

  test("stream-stream interval join: streaming == batch, both sides stateful") {
    val ev = streamEvents
    val streaming = runToMemory(
      StreamingAggregates.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase")),
      "interval_join_stream", "append")
    val batchEv = Tables.events(spark, sf)
    val batch = StreamingAggregates.intervalJoin(
      batchEv.filter(col("event_type") === "click"),
      batchEv.filter(col("event_type") === "purchase"))
    val b = batch.collect().map(_.toSeq).toSet
    val s = streaming.collect().map(_.toSeq).toSet
    assert(s.nonEmpty)
    // every streamed pair is a true batch pair; watermark may hold back
    // only pairs near the stream's end
    assert(s.subsetOf(b))
    assert(s.size >= (b.size * 0.8).toInt)
  }

  test("flatMapGroupsWithState running totals match batch totals") {
    val streaming = runToMemory(
      StreamingAggregates.runningUserTotals(spark, streamEvents).toDF(),
      "running_stream", "update")
    // last update per user == batch per-user totals
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val lastPerUser = streaming
      .withColumn("__max_n", max(col("n_events")).over(w))
      .filter(col("n_events") === col("__max_n"))
      .select(col("user_id"), col("n_events"))
      .distinct()
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val diff = lastPerUser.join(batch, Seq("user_id"))
      .filter(lastPerUser("n_events") =!= batch("n_events"))
    assert(diff.isEmpty)
    assert(lastPerUser.count() == batch.count())
  }
}
