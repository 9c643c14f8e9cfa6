package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** The reference's two orchestrated pipelines, restated as driver-side stage
  * functions (SURVEY.md §3.2/§3.3): what was 6 Airflow tasks across 3
  * services becomes one driver program; only transform/validate/write touch
  * executors.
  */
object Jobs {

  final case class RunSummary(
      runId: String,
      inputPath: String,
      validation: Validation.Report,
      recordCount: Long,
      status: String)

  /** Path A — the validated Beam-path pipeline
    * (`/root/reference/dataflow.py:486` chain + `dataflow_transform.py`):
    * validate → clean/type → write main table (truncate) → append audit row,
    * with the record count observed on the write pass (no second traversal).
    */
  def covidPipeline(spark: SparkSession, inputCsv: String, outputTable: String,
                    auditTable: String, runId: String = "local-run"): RunSummary = {
    // Stage 0: file-level pre-flight (exists/empty/utf8; size/age warns) —
    // metadata-only, replaces the reference's whole-file download checks
    val fileGate = FileChecks.check(spark, inputCsv)
    if (fileGate.failed)
      throw new IllegalStateException(
        s"file checks failed for $inputCsv: " +
          fileGate.files.filter(f => !f.exists || f.empty || !f.utf8Ok)
            .map(_.path).mkString(","))

    // Stage 1: data-quality gate (replaces dataflow.py:62-134)
    val raw = Sources.csv(spark, inputCsv, Schemas.covidRaw)
    val report = Validation.run(raw, Validation.covidCsvRules)
    if (report.failed)
      throw new IllegalStateException(
        s"validation failed for $inputCsv: total=${report.totalRecords} " +
          report.results.filter(_.violations > 0).map(r => s"${r.name}=${r.violations}").mkString(","))

    // Stage 2+3: transform + truncate-write with observed count
    val counted = Audit.observed(CovidTransform.clean(raw))
    Sinks.overwriteTable(counted.df, outputTable)
    val n = counted.recordCount

    // Stage 4: audit append (dataflow_transform.py:192-214)
    Sinks.appendTable(Audit.auditRow(spark, inputCsv, n), auditTable)
    RunSummary(runId, inputCsv, report, n, "completed")
  }

  /** Path B — the ELT/SQL pipeline (`/root/reference/airflow.py:37-123`, in
    * its INTENDED task order, SURVEY.md §0): DDL staging+final → bulk load
    * with schema autodetect + truncate → INSERT INTO final SELECT …
    * WHERE total_confirmed_deaths > 0 (`airflow.py:108-116`), executed by
    * Spark SQL's own parse→analyze→optimize→execute lifecycle.
    */
  def eltPipeline(spark: SparkSession, inputCsv: String, db: String): Long = {
    Sinks.ensureDatabase(spark, db)
    Sinks.ensureTable(spark, s"$db.stg_covid_data", Schemas.covidStaging)
    Sinks.ensureTable(spark, s"$db.final_covid_data", Schemas.covidStaging)

    // bulk load, autodetect=True + truncate (airflow.py:87-101)
    // try_cast: autodetect keeps unparseable cells as NULL rather than
    // failing the load (ANSI cast would throw on e.g. a bad date string)
    val loaded = Sources.csvAutodetect(spark, inputCsv)
      .withColumn("Day", expr("try_cast(Day AS TIMESTAMP_NTZ)"))
      .withColumn("total_confirmed_deaths", expr("try_cast(total_confirmed_deaths AS DOUBLE)"))
      .select("entity", "Day", "total_confirmed_deaths")
    loaded.write.mode("overwrite").insertInto(s"$db.stg_covid_data")

    // the one piece of real SQL in the reference (airflow.py:108-116)
    spark.sql(
      s"""INSERT INTO $db.final_covid_data
         |SELECT entity, Day, total_confirmed_deaths
         |FROM $db.stg_covid_data
         |WHERE total_confirmed_deaths > 0""".stripMargin)

    // post-load assertion — the imported-but-unused BigQueryCheckOperator
    // intent (airflow.py:7; SURVEY.md §2.8)
    require(Sinks.check(spark, s"SELECT COUNT(*) > 0 FROM $db.final_covid_data"),
      "post-load check failed: final table is empty")
    spark.table(s"$db.final_covid_data").count()
  }
}
