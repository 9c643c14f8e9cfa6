package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-row clean+type transform
  * (`/root/reference/dataflow_transform.py:32-73`) re-expressed as one
  * declarative select+filter plan.
  *
  * Python reject semantics preserved exactly:
  *   - missing/empty (falsy) required field → reject (`:39-41`);
  *   - `int(float(x))` — truncation toward zero, reject on parse failure
  *     (`:44-48`);
  *   - strict `YYYY-MM-DD`: length 10, two dashes, real calendar date
  *     (`:50-61`);
  *   - `str(x).strip()` on entity (`:65`);
  *   - append `processed_timestamp` = now-UTC (`:68`) — per-QUERY in Spark
  *     vs per-row in Python, a documented improvement (SURVEY.md §7.3).
  *
  * Where Beam runs a Python function per record, this compiles to a single
  * whole-stage-codegen'd projection over a columnar scan: the same WHAT at
  * 100 TB without a Python boundary. Rejects are dropped by predicate (the
  * reference's `beam.Filter(x is not None)` pair, `:173`/`:175` — Catalyst
  * merges all reject conditions into one Filter).
  */
object CovidTransform {

  private def emptyish(c: Column): Column = c.isNull || trim(c) === ""

  /** Parse results as columns; null ⇒ that field failed its parse/check.
    * Both casts are try_cast: the outer one turns NaN/Infinity doubles into
    * rejects (Python's int(float("NaN")) raises ⇒ row dropped), where an
    * ANSI cast would throw CAST_OVERFLOW at runtime.
    */
  private def deathsParsed: Column =
    when(emptyish(col("total_confirmed_deaths")), lit(null))
      .otherwise(expr(
        // double→long truncates toward zero == Python int(float(x))
        "try_cast(try_cast(trim(total_confirmed_deaths) AS DOUBLE) AS BIGINT)"))

  private def dayParsed: Column =
    when(!col("Day").rlike("^\\d{4}-\\d{2}-\\d{2}$"), lit(null))
      .otherwise(expr("try_to_date(Day, 'yyyy-MM-dd')"))

  /** Clean rows that survive every check, in the strict typed schema. */
  def clean(raw: DataFrame): DataFrame =
    parsed(raw).filter(col("__ok")).drop("__ok")

  /** Rows the reference would drop, with a reason column (extension: the
    * reference silently discards; at scale you want a quarantine channel).
    */
  def rejects(raw: DataFrame): DataFrame = {
    val p = parsedKeepRaw(raw)
    p.filter(!col("__ok"))
      .select(col("entity_raw").as("entity"), col("Day_raw").as("Day"),
        col("deaths_raw").as("total_confirmed_deaths"),
        when(emptyish(col("entity_raw")) || emptyish(col("Day_raw")) ||
             emptyish(col("deaths_raw")), "missing_required_field")
          .when(col("__deaths").isNull, "invalid_numeric")
          .otherwise("invalid_date").as("reject_reason"))
  }

  private def parsed(raw: DataFrame): DataFrame =
    parsedKeepRaw(raw).select(
      col("__entity").as("entity"),
      col("__day").as("Day"),
      col("__deaths").as("total_confirmed_deaths"),
      current_timestamp().as("processed_timestamp"),
      col("__ok"))

  private def parsedKeepRaw(raw: DataFrame): DataFrame = {
    raw
      .withColumn("entity_raw", col("entity"))
      .withColumn("Day_raw", col("Day"))
      .withColumn("deaths_raw", col("total_confirmed_deaths"))
      .withColumn("__entity",
        when(emptyish(col("entity")), lit(null)).otherwise(trim(col("entity").cast("string"))))
      .withColumn("__deaths", deathsParsed)
      .withColumn("__day", dayParsed)
      .withColumn("__ok",
        col("__entity").isNotNull && col("__deaths").isNotNull && col("__day").isNotNull)
  }
}
