package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ScaleOps.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
    ScaleOps.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 4)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("salted join produces identical results to plain join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o, Seq("k")).agg(
      count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head().toSeq
    val salted = ScaleOps.saltedJoin(li, o, "k", salts = 4).agg(
      count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head().toSeq
    assert(plain == salted)
  }

  test("time-partitioned write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-tp").toString + "/events"
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ScaleOps.writeTimePartitioned(ev, out, "day", "ts_ns", 4)
    val read = spark.read.parquet(out).filter(col("day") === "2024-01-05")
    val scan = read.queryExecution.executedPlan.toString
    // partition filter must land in the scan, not a post-filter
    assert(read.count() == ev.filter(col("day") === "2024-01-05").count())
    assert(scan.contains("PartitionFilters") || !scan.contains("Filter ("))
  }
}
