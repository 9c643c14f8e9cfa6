package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.etl.CovidTransform

/** Property test (SURVEY.md §5.2): the declarative Spark transform must
  * agree row-for-row with a direct reimplementation of the reference's
  * Python semantics (dataflow_transform.py:32-73) on arbitrary dirty rows,
  * and clean+rejects must partition the input.
  */
object CovidTransformProps extends Properties("CovidTransform") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val entityGen: Gen[String] = Gen.oneOf(
    Gen.const(null), Gen.const(""), Gen.const("   "),
    Gen.const("France"), Gen.const(" France "), Gen.const("Côte d'Ivoire"),
    Gen.alphaStr.map(_.take(12)))

  private val dayGen: Gen[String] = Gen.oneOf(
    Gen.const(null), Gen.const(""), Gen.const("2020-03-15"),
    Gen.const("2020-3-15"), Gen.const("15-03-2020"), Gen.const("2020-13-40"),
    Gen.const("2020-02-30"), Gen.const("garbage"), Gen.const("2021-12-31"))

  private val deathsGen: Gen[String] = Gen.oneOf(
    Gen.const(null), Gen.const(""), Gen.const("0"), Gen.const("12"),
    Gen.const("12.9"), Gen.const("-3.2"), Gen.const(" 7 "),
    Gen.const("abc"), Gen.const("1e3"), Gen.const("NaN"))

  private val rowsGen: Gen[List[(String, String, String)]] =
    Gen.listOfN(40, Gen.zip(entityGen, dayGen, deathsGen))

  /** Direct reimplementation of the reference's per-row Python logic. */
  private def pythonClean(e: String, d: String, v: String): Option[(String, String, Long)] = {
    def falsy(s: String) = s == null || s.isEmpty
    // NOTE: Python checks `not element[field]` BEFORE strip — "   " is truthy
    if (falsy(e) || falsy(d) || falsy(v)) return None
    val deaths =
      try Some(v.trim.toDouble).filterNot(x => x.isNaN || x.isInfinite).map(_.toLong)
      catch { case _: NumberFormatException => None }
    if (deaths.isEmpty) return None
    if (d.length != 10 || d.count(_ == '-') != 2) return None
    val date =
      try Some(java.time.LocalDate.parse(d))
      catch { case _: java.time.format.DateTimeParseException => None }
    if (date.isEmpty) return None
    val entity = e.trim
    if (entity.isEmpty) return None // trim may empty it; REQUIRED rejects
    Some((entity, d, deaths.get))
  }

  property("clean matches python semantics; clean+rejects partition input") =
    Prop.forAll(rowsGen) { rows =>
      val spark = SparkTestSession.spark
      import spark.implicits._
      val df = rows.toDF("entity", "Day", "total_confirmed_deaths")
      val clean = CovidTransform.clean(df)
        .select("entity", "Day", "total_confirmed_deaths")
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
        .sorted
      val expected = rows.flatMap { case (e, d, v) => pythonClean(e, d, v) }
        .map { case (e, d, n) => (e, d, n) }.sorted
      val rejects = CovidTransform.rejects(df).count()
      (clean.toSeq == expected) :| s"clean=${clean.toSeq} expected=$expected" &&
        (clean.length + rejects == rows.length) :| "partition"
    }
}
