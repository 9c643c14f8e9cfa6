package graft.etl

import org.apache.spark.sql.types._

/** The reference's three schema declarations (SURVEY.md §1.2), frozen as
  * Spark StructTypes.
  *
  * The two paths intentionally disagree on types for the same logical
  * columns: the transform path is strict/REQUIRED
  * (`/root/reference/dataflow_transform.py:141-148`), the ELT staging path is
  * lenient/NULLABLE (`/root/reference/airflow.py:62-66`). Both dialects are
  * modeled. Parquet does not enforce nullability on write, so REQUIRED is
  * realized as rejection predicates in [[CovidTransform]].
  */
object Schemas {

  /** Positional input-side schema — the reference names CSV columns from a
    * hardcoded header list (`dataflow_transform.py:22`). Everything arrives
    * as strings; typing happens in the transform.
    */
  val covidRaw: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = true),
    StructField("Day", StringType, nullable = true),
    StructField("total_confirmed_deaths", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** Strict typed output schema (`dataflow_transform.py:141-148`):
    * entity STRING REQUIRED, Day DATE REQUIRED,
    * total_confirmed_deaths INTEGER REQUIRED,
    * processed_timestamp TIMESTAMP NULLABLE.
    */
  val covidTyped: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = false),
    StructField("Day", DateType, nullable = false),
    StructField("total_confirmed_deaths", LongType, nullable = false),
    StructField("processed_timestamp", TimestampType, nullable = true)))

  /** Lenient ELT staging/final schema (`airflow.py:62-66`, `:77-81`):
    * entity STRING NULLABLE, Day DATETIME NULLABLE,
    * total_confirmed_deaths FLOAT NULLABLE.
    */
  val covidStaging: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = true),
    StructField("Day", TimestampNTZType, nullable = true),
    StructField("total_confirmed_deaths", DoubleType, nullable = true)))

  /** Audit-log schema (`dataflow_transform.py:151-160`). */
  val audit: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("ingestion_time", TimestampType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("input_path", StringType, nullable = false),
    StructField("pipeline_status", StringType, nullable = false),
    StructField("processed_timestamp", TimestampType, nullable = true)))
}
