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

  // events parquet raw `ts` unit varies across fixture generations (INT64
  // NANOS read as bigint vs native TIMESTAMP micros) — take the stream-source
  // schema from a batch read so the spec tracks Tables.events' detection.
  private lazy val rawTsType: DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
  }
  private lazy val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", rawTsType),
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
    val raw = spark.readStream.schema(rawSchema).parquet(streamDir)
    rawTsType match {
      case LongType => // NANOS-as-long fixture
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // native TIMESTAMP(MICROS) fixture
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
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

  test("aggStateSink: waves fold into state equal to one direct build") {
    import spark.implicits._
    import graft.ops.AggState
    import graft.streaming.StreamingIngest
    val in = java.nio.file.Files.createTempDirectory("graft-mv-in")
    val state = java.nio.file.Files.createTempDirectory("graft-mv-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-ckpt").toString
    def wave(rows: Seq[(String, Double)]): Long = {
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(in.toString)
      StreamingIngest.aggStateSink(spark,
        spark.readStream.schema("k STRING, v DOUBLE").parquet(in.toString),
        Seq("k"), "v", state, ckpt)
    }
    val w1 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0))
    val w2 = Seq(("a", 3.0), ("c", 7.0), ("b", -4.0))
    assert(wave(w1) == 1L)
    assert(wave(w2) == 1L)
    def canon(df: DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq
    val direct = AggState.build((w1 ++ w2).toDF("k", "v"), Seq("k"), "v")
    assert(canon(StreamingIngest.readAggState(spark, state)) == canon(direct))
    // serving: finalize over the stored state is the exact metrics table
    val fin = AggState.finalizeState(
      StreamingIngest.readAggState(spark, state), Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(fin.toSeq == Seq(("a", 3L, 2.0), ("b", 2L, 3.0), ("c", 1L, 7.0)))
  }

  test("aggStateSink: replays skip, torn versions are invisible") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val in = java.nio.file.Files.createTempDirectory("graft-mv2-in")
    val state = java.nio.file.Files.createTempDirectory("graft-mv2-state")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv2-ckpt").toString
    Seq(("a", 1.0)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(in.toString)
    def run(): Long = StreamingIngest.aggStateSink(spark,
      spark.readStream.schema("k STRING, v DOUBLE").parquet(in.toString),
      Seq("k"), "v", state.toString, ckpt)
    assert(run() == 1L)
    val before = StreamingIngest.readAggState(spark, state.toString)
      .collect().map(_.toString).sorted.toSeq
    // no new input: AvailableNow finds nothing or replays — state unchanged
    assert(run() == 0L)
    // a torn (uncommitted) version directory must be ignored by readers
    val torn = state.resolve("v999")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.writeString(torn.resolve("garbage.txt"), "not parquet")
    val after = StreamingIngest.readAggState(spark, state.toString)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
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
