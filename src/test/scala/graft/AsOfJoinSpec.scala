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

  test("rejects colliding payload columns") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "t", "t", Seq("t"))
    }
  }
}
