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

  /** Incremental dedup-append sink: each micro-batch is deduped within
    * itself (first row per key in `orderCol` order), anti-joined against
    * the keys already in the target, and APPENDED — the insert-only upsert
    * that continuous ingest needs, expressed safely on plain parquet
    * (append never rewrites files, so concurrent readers are fine; no
    * atomic-overwrite gymnastics).
    *
    * Update-in-place upserts (SCD1 over a stream) need a table format with
    * transactional file replacement (Delta/Iceberg) — deliberately out of
    * scope for a plain-parquet sink; batch-mode SCD1 is
    * [[graft.ops.ScaleOps.upsert]].
    *
    * Scale shape: the anti-join reads ONLY the key column from the target
    * (column pruning reaches the parquet scan), so per-batch cost is
    * |batch| × (target key scan), not a full-table rewrite. The
    * exactly-once story is the file-source checkpoint (per-file progress)
    * + key-level idempotence of the anti-join: a replayed batch re-drops
    * its already-appended keys.
    *
    * Blocks until all currently-available input is drained (AvailableNow).
    * Returns rows appended across this invocation.
    */
  def dedupAppendSink(spark: SparkSession, stream: DataFrame, keyCol: String,
                      orderCol: String, targetDir: String,
                      checkpointDir: String): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
        val batchDeduped = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // Probe via Hadoop FS, not java.io.File: the target can live on any
        // filesystem Spark can write (hdfs://, s3a://, ...), where a local
        // File.exists() is always false and would silently skip the
        // anti-join — breaking the key-level idempotence contract.
        val targetPath = new org.apache.hadoop.fs.Path(targetDir)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          targetPath.toUri, spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (fs.exists(targetPath)) {
            val existingKeys = spark.read.parquet(targetDir).select(col(keyCol))
            batchDeduped.join(existingKeys, Seq(keyCol), "left_anti")
          } else batchDeduped
        fresh.persist() // one computation for the count AND the append
        try {
          val n = fresh.count()
          if (n > 0) fresh.write.mode(SaveMode.Append).parquet(targetDir)
          appended.addAndGet(n)
        } finally fresh.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
    appended.get()
  }
}
