package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._
import graft.sources.Sources

/** Golden tests for the reference-surface ETL (SURVEY.md §5.2): the fixture
  * CSV carries one row per reject branch of dataflow_transform.py:32-61.
  */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixture = "src/test/resources/covid_daily.csv"

  private def raw = Sources.csv(spark, fixture, Schemas.covidRaw)

  test("transform keeps exactly the rows the reference keeps") {
    val clean = CovidTransform.clean(raw)
    val rows = clean.orderBy("entity").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("Afghanistan", "Albania", "Algeria", "Bahrain", "Belgium"))
  }

  test("int(float(x)) truncation: 12.9 -> 12; trim applied") {
    val clean = CovidTransform.clean(raw)
    val algeria = clean.filter(col("entity") === "Algeria").head()
    assert(algeria.getLong(algeria.fieldIndex("total_confirmed_deaths")) == 12L)
    // " Albania " trimmed to "Albania" (entity equality above already proves it)
    val bahrain = clean.filter(col("entity") === "Bahrain").head()
    assert(bahrain.getLong(bahrain.fieldIndex("total_confirmed_deaths")) == -3L)
  }

  test("rejects carry reasons, one per reject branch") {
    val rejects = CovidTransform.rejects(raw)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(rejects.size == 7)
    assert(rejects(null) == "missing_required_field") // empty entity
    assert(rejects("Andorra") == "missing_required_field") // empty Day
    assert(rejects("Angola") == "missing_required_field") // empty deaths
    assert(rejects("Argentina") == "invalid_date") // 2020-3-28, len != 10
    assert(rejects("Armenia") == "invalid_date") // wrong format
    assert(rejects("Australia") == "invalid_date") // month 13
    assert(rejects("Austria") == "invalid_numeric") // abc
  }

  test("validation gate: one-pass report with warn counts, not failed") {
    val report = Validation.run(raw, Validation.covidCsvRules)
    assert(report.totalRecords == 12)
    assert(!report.failed)
    assert(report.violations("required_entity") == 1)
    assert(report.violations("required_Day") == 1)
    assert(report.violations("required_total_confirmed_deaths") == 1)
    assert(report.violations("numeric_total_confirmed_deaths") == 1) // abc
    assert(report.violations("date_Day") == 3) // 2020-3-28, 03-29-2020, 2020-13-29
  }

  test("validation gate fails on empty input") {
    val empty = raw.filter(lit(false))
    assert(Validation.run(empty, Validation.covidCsvRules).failed)
  }

  test("covid pipeline end-to-end: tables + observed count + audit row") {
    spark.sql("DROP TABLE IF EXISTS transformed_table")
    spark.sql("DROP TABLE IF EXISTS audit_log")
    val summary = Jobs.covidPipeline(spark, fixture, "transformed_table", "audit_log")
    assert(summary.recordCount == 5)
    assert(spark.table("transformed_table").count() == 5)
    val audit = spark.table("audit_log").collect()
    assert(audit.length == 1)
    val a = audit.head
    assert(a.getString(a.fieldIndex("file_name")) == "covid_daily.csv")
    assert(a.getLong(a.fieldIndex("record_count")) == 5L)
    assert(a.getString(a.fieldIndex("pipeline_status")) == "completed")
    // second run appends a second audit row but truncates the main table
    Jobs.covidPipeline(spark, fixture, "transformed_table", "audit_log")
    assert(spark.table("transformed_table").count() == 5)
    assert(spark.table("audit_log").count() == 2)
  }

  test("ELT pipeline: autodetect load + INSERT INTO ... WHERE deaths > 0") {
    Sinks.ensureDatabase(spark, "covid")
    spark.sql("DROP TABLE IF EXISTS covid.stg_covid_data")
    spark.sql("DROP TABLE IF EXISTS covid.final_covid_data")
    val n = Jobs.eltPipeline(spark, fixture, "covid")
    // deaths parseable and > 0: 40, 21.0, 12.9, 10, 5, 7, 8, 9 -> 8 rows
    assert(n == 8)
    // lenient dialect: Algeria keeps 12.9 (FLOAT), no truncation
    val algeria = spark.table("covid.final_covid_data")
      .filter(col("entity") === "Algeria").head()
    assert(algeria.getDouble(algeria.fieldIndex("total_confirmed_deaths")) == 12.9)
  }

  test("streaming ingest: AvailableNow drains files exactly once") {
    val dir = Files.createTempDirectory("graft-stream-in")
    val out = Files.createTempDirectory("graft-stream-out").resolve("data").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    Files.copy(Paths.get(fixture), dir.resolve("covid_daily.csv"),
      StandardCopyOption.REPLACE_EXISTING)
    val n1 = streaming.StreamingIngest.runAvailableNow(spark, dir.toString, out, ckpt)
    assert(n1 == 5)
    assert(spark.read.parquet(out).count() == 5)
    // re-run with no new files: checkpoint ensures nothing is reprocessed
    val n2 = streaming.StreamingIngest.runAvailableNow(spark, dir.toString, out, ckpt)
    assert(n2 == 0)
    // a newly arriving file is picked up incrementally
    Files.copy(Paths.get(fixture), dir.resolve("covid_daily_2.csv"))
    val n3 = streaming.StreamingIngest.runAvailableNow(spark, dir.toString, out, ckpt)
    assert(n3 == 5)
    assert(spark.read.parquet(out).count() == 10)
  }

  test("source resolver dispatches by extension") {
    val tmp = Files.createTempDirectory("graft-src")
    val txt = tmp.resolve("notes.txt")
    Files.writeString(txt, "line one\n\n  \nline two\n")
    assert(Sources.resolve(spark, txt.toString, Schemas.covidRaw).count() == 2)
    val jsonl = tmp.resolve("records.jsonl")
    Files.writeString(jsonl, """{"id":1,"name":"a","value":2.5}""" + "\n" +
      """{"id":2,"name":"b","value":3.5}""" + "\n")
    assert(Sources.resolve(spark, jsonl.toString, Schemas.covidRaw).count() == 2)
    val json = tmp.resolve("records.json")
    Files.writeString(json, """[{"id":1,"name":"a","value":1.0},{"id":2,"name":"b","value":2.0}]""")
    assert(Sources.resolve(spark, json.toString, Schemas.covidRaw).count() == 2)
    intercept[IllegalArgumentException] {
      Sources.resolve(spark, "file.parquet.xyz", Schemas.covidRaw)
    }
  }

  test("multi-format timestamp rule accepts the 5 reference formats") {
    import spark.implicits._
    val df = Seq("2020-03-01 10:00:00", "2020-03-01T10:00:00",
      "2020-03-01 10:00:00.123456", "2020-03-01T10:00:00.123456",
      "2020-03-01", "01/03/2020", "garbage", null)
      .toDF("ts_str")
    val rule = Validation.timestampAnyFormat("ts_str")
    val report = Validation.run(df, Seq(rule))
    assert(report.totalRecords == 8)
    assert(report.violations("timestamp_ts_str") == 2) // 01/03/2020, garbage
  }

  test("Sql entry point runs text SQL over registered fixture views") {
    val run = Sql.session(spark, "/root/testdata/sf0.001")
    assert(run("SELECT COUNT(*) AS n FROM lineitem").head().getLong(0) == 6000L)
    val joined = run(
      """SELECT r_name, COUNT(*) AS n FROM nation
        |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(joined.count() == 5)
  }

  test("CleanOps: trailing colons / special chars removed; status split partitions") {
    import spark.implicits._
    val df = Seq(("Pizza Palace::", "delivered"), ("Bob's Burgers!!:", "pending"),
      ("Clean Name", "delivered")).toDF("restaurant", "status")
    val cleaned = CleanOps.cleanColumns(df, Seq("restaurant"))
      .collect().map(_.getString(0))
    assert(cleaned.toSeq == Seq("Pizza Palace", "Bobs Burgers", "Clean Name"))
    val (delivered, other) = CleanOps.splitByStatus(df, "status", "delivered")
    assert(delivered.count() == 2 && other.count() == 1)
    assert(delivered.count() + other.count() == df.count())
  }

  test("per-file counts derive basenames in-plan") {
    val counts = Validation.perFileCounts(
      spark.read.option("header", "true").csv(fixture)).collect()
    assert(counts.length == 1)
    assert(counts.head.getString(0) == "covid_daily.csv")
    assert(counts.head.getLong(1) == 12L)
  }

  test("typed Aggregator (udaf): Welford variance matches var_samp") {
    functions.Aggregators.register(spark)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val row = li.agg(
      functions.Aggregators.varWelford(col("l_quantity")).as("w"),
      var_samp(col("l_quantity")).as("v")).head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-6)
  }

  test("post-load check operator semantics") {
    assert(Sinks.check(spark, "SELECT 1"))
    assert(!Sinks.check(spark, "SELECT COUNT(*) FROM range(10) WHERE id > 100"))
  }

  test("flattenStructs: deep nesting, arrays preserved, nulls, zero shuffles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "v")
      .select(col("id"),
        struct(struct(col("v").as("deep"), lit(7L).as("n")).as("inner"),
          array(lit(1), lit(2)).as("arr")).as("outer"))
    val flat = graft.sources.Sources.flattenStructs(df)
    assert(flat.columns.toSeq ==
      Seq("id", "outer_inner_deep", "outer_inner_n", "outer_arr"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getString(1) == "x" && rows(0).getLong(2) == 7L &&
      rows(0).getSeq[Int](3) == Seq(1, 2))
    assert(rows(1).isNullAt(1), "null leaf survives the flatten")
    // pure projection: no exchange in the plan
    assert(!flat.queryExecution.executedPlan.toString.contains("Exchange"))
    // dotted FIELD NAMES don't split into paths (backtick quoting)
    val dotted = Seq(1L).toDF("id")
      .select(struct(lit(5L).as("a.b")).as("s"))
    val fd = graft.sources.Sources.flattenStructs(dotted)
    assert(fd.columns.toSeq == Seq("s_a.b") && fd.head().getLong(0) == 5L)
  }
}
