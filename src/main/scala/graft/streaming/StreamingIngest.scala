package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.etl.{CovidTransform, Schemas}

/** File-arrival micro-batching (SURVEY.md §2.9): the reference's
  * sensor-poll + per-file reprocess + append loop
  * (`/root/reference/airflow.py:47-54`, `README.md:157-166`) as a Structured
  * Streaming file source with `Trigger.AvailableNow` + `foreachBatch`.
  *
  * File-source checkpointing gives exactly-once per-file processing — the
  * property the reference approximates with sensor + move-to-processed.
  * The same code runs continuously (`Trigger.ProcessingTime`) on a cluster;
  * AvailableNow drains what exists and stops, which is the batch-parity mode.
  */
object StreamingIngest {

  /** Watch `inputDir` for covid CSVs; clean each micro-batch and append to
    * `outputPath` parquet. Blocks until all currently-available files are
    * processed. Returns rows written across this invocation.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, outputPath: String,
                      checkpointDir: String): Long = {
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    val raw = spark.readStream
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(Schemas.covidRaw)
      .csv(inputDir)
    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val clean = CovidTransform.clean(batch)
        val counted = graft.etl.Audit.observed(clean)
        graft.etl.Sinks.writeParquet(counted.df, outputPath, SaveMode.Append)
        written.addAndGet(counted.recordCount)
        ()
      }
      .start()
    q.awaitTermination()
    written.get()
  }
}
