package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("backward as-of join picks latest right row <= left time") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 15L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, 100.0), (1L, 10L, 101.0), (1L, 18L, 102.0),
      (2L, 30L, 200.0))
      .toDF("k", "qt", "px")
    val got = AsOfJoin.backward(trades, quotes, "k", "t", "qt", Seq("px"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 10L, "t1", 101.0), // equal timestamp matches (inclusive)
      (1L, 20L, "t2", 102.0),
      (2L, 15L, "t3", null))) // no quote at or before t=15 for k=2
  }

  test("forward as-of join picks earliest right row >= left time") {
    import spark.implicits._
    val signups = Seq((1L, 10L, "s1"), (1L, 25L, "s2"), (2L, 15L, "s3"))
      .toDF("k", "t", "signup")
    val purchases = Seq((1L, 10L, 100.0), (1L, 18L, 101.0), (1L, 40L, 102.0),
      (2L, 5L, 200.0))
      .toDF("k", "pt", "px")
    val got = AsOfJoin.forward(signups, purchases, "k", "t", "pt", Seq("px"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 10L, "s1", 100.0), // equal timestamp matches (inclusive)
      (1L, 25L, "s2", 102.0),
      (2L, 15L, "s3", null))) // no purchase at or after t=15 for k=2
  }

  test("tolerance nulls matches beyond the bound, both directions") {
    import spark.implicits._
    val l = Seq((1L, 100L, "x"), (1L, 200L, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 95L, 1.0), (1L, 210L, 2.0)).toDF("k", "rt", "v")
    val back = AsOfJoin.backward(l, r, "k", "t", "rt", Seq("v"),
      tolerance = Some(10L))
      .orderBy("t").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(back.toSeq == Seq(1.0, null)) // 200-95=105 > 10 -> nulled
    val fwd = AsOfJoin.forward(l, r, "k", "t", "rt", Seq("v"),
      tolerance = Some(10L))
      .orderBy("t").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(fwd.toSeq == Seq(null, 2.0)) // 210-100=110 > 10 -> nulled
  }

  test("rejects colliding payload columns") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "t", "t", Seq("t"))
    }
  }
}
