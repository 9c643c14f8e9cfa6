package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AggState

class AggStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq

  test("tree of merges equals one direct build, bit-exact") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("k"), col("o_totalprice").as("v"))
    val keys = Seq("k")
    val direct = AggState.build(o, keys, "v")
    // 3-way disjoint split, merged as merge(merge(a,b),c) — tree shape
    val parts = (0 until 3).map(i => o.filter(col("v").isNotNull &&
      pmod(xxhash64(col("v")), lit(3)) === i || col("v").isNull && lit(i) === 0))
    val built = parts.map(p => AggState.build(p, keys, "v"))
    val treeMerged = AggState.merge(keys,
      AggState.merge(keys, built(0), built(1)), built(2))
    assert(canon(treeMerged) == canon(direct))
    // finalize over both is then trivially identical too
    assert(canon(AggState.finalizeState(treeMerged, keys)) ==
      canon(AggState.finalizeState(direct, keys)))
  }

  test("state schema is stable across build and any merge depth") {
    import spark.implicits._
    val df = Seq(("a", 1.5), ("a", 2.5), ("b", 3.0)).toDF("k", "v")
    val s1 = AggState.build(df, Seq("k"), "v")
    val s2 = AggState.merge(Seq("k"), s1, s1)
    val s3 = AggState.merge(Seq("k"), s2, s1)
    assert(s1.schema == s2.schema)
    assert(s2.schema == s3.schema)
  }

  test("finalize matches hand-computed mean/variance and handles nulls") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(5.0)), ("c", None: Option[Double])).toDF("k", "v")
    val fin = AggState.finalizeState(AggState.build(df, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect()
    val a = fin(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3 &&
      a.getDouble(2) == 2.0 && a.getDouble(3) == 1.0 &&
      a.getDouble(4) == 1.0 && a.getDouble(5) == 3.0)
    val b = fin(1) // single row: variance null
    assert(b.getString(0) == "b" && b.getLong(1) == 1 &&
      b.getDouble(2) == 5.0 && b.isNullAt(3))
    val c = fin(2) // all-null group: every metric null, count 0
    assert(c.getString(0) == "c" && c.getLong(1) == 0 &&
      c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4) && c.isNullAt(5))
  }

  test("merge rejects states built at different scales") {
    import spark.implicits._
    val df = Seq(("a", 1.5)).toDF("k", "v")
    val s4 = AggState.build(df, Seq("k"), "v", scale = 4)
    val s6 = AggState.build(df, Seq("k"), "v", scale = 6)
    val e = intercept[IllegalArgumentException](AggState.merge(Seq("k"), s4, s6))
    assert(e.getMessage.contains("scale"))
  }

  test("merge result is independent of partition layout") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("k"), col("o_totalprice").as("v"))
    val s1 = AggState.build(o.repartition(1), Seq("k"), "v")
    val s17 = AggState.build(o.repartition(17, col("v")), Seq("k"), "v")
    assert(canon(s1) == canon(s17))
  }

  test("finalize is a pure projection — no exchange in its plan") {
    import spark.implicits._
    val st = AggState.build(Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
      .localCheckpoint()
    val plan = AggState.finalizeState(st, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
