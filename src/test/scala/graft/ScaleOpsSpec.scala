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

  test("zorderValue matches a reference bit-interleave; wraps out-of-range") {
    import spark.implicits._
    def ref(vals: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (j <- vals.indices; i <- 0 until bits)
        z |= (((vals(j) & ((1L << bits) - 1)) >> i) & 1L) << (i * vals.size + j)
      z
    }
    val rows = for (x <- 0L until 40L; y <- Seq(0L, 7L, 255L, 300L))
      yield (x, y)
    val got = rows.toDF("x", "y")
      .withColumn("z", ScaleOps.zorderValue(Seq(col("x"), col("y")), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(Seq(x, y), 8), s"($x,$y)") }
    // adjacent-in-both-dims points have close z-values (locality sanity)
    assert(ref(Seq(3, 3), 8) - ref(Seq(2, 2), 8) < 16)
  }

  test("clusterByZOrder: partitions carry tight envelopes on BOTH dims") {
    import spark.implicits._
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    // pruning metric: a scan filtering on dimension d skips a partition
    // iff d falls outside its [min,max] envelope, so the per-dimension
    // span sum ∝ expected partitions touched. The WORST dimension is
    // what matters — a single-column sort gives perfect x-envelopes but
    // full-range y-envelopes (zero pruning on y).
    def worstDimSpanSum(df: org.apache.spark.sql.DataFrame): Long = {
      val spans = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .agg(sum(col("sx")), sum(col("sy"))).head()
      math.max(spans.getLong(0), spans.getLong(1))
    }
    val clustered = ScaleOps.clusterByZOrder(grid,
      Seq(col("x"), col("y")), bits = 6, numPartitions = 16)
    val zWorst = worstDimSpanSum(clustered)
    val sorted = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val sortWorst = worstDimSpanSum(sorted)
    // 16 z-partitions of a 64x64 grid ≈ 16x16 tiles: both dims span ~15
    // per partition (sum ~240); x-sort stripes span the full 63 on y
    // (sum ~1008). z must prune the worst dimension ≥ 2x better.
    assert(zWorst < sortWorst / 2, s"z=$zWorst sort=$sortWorst")
    // clustering only reorders rows
    assert(clustered.count() == grid.count())
  }

  test("snapshotDiff classifies insert/delete/update/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "D", 40.0),
      (5L, "e", 50.0)).toDF("k", "s", "v")
    val got = ScaleOps.snapshotDiff(old, neu, Seq("k"),
      includeUnchanged = true)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0, "unchanged"),
      (2L, "b", 25.0, "update"),   // new payload carried
      (3L, "c", 30.0, "delete"),   // old payload carried
      (4L, "D", 40.0, "update"),
      (5L, "e", 50.0, "insert")))
    // default drops unchanged
    assert(ScaleOps.snapshotDiff(old, neu, Seq("k")).count() == 4)
  }

  test("snapshotDiff: field going NULL is an update and stays NULL") {
    import spark.implicits._
    val old = Seq((1L, Some(10.0)), (2L, None: Option[Double])).toDF("k", "v")
    val neu = Seq((1L, None: Option[Double]), (2L, None: Option[Double])).toDF("k", "v")
    val got = ScaleOps.snapshotDiff(old, neu, Seq("k"), includeUnchanged = true)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1),
        r.getString(2)))
    assert(got.toSeq == Seq((1L, null, "update"), (2L, null, "unchanged")))
  }

  test("snapshotDiff rejects duplicate keys within a snapshot") {
    import spark.implicits._
    val old = Seq((1L, "a"), (1L, "b")).toDF("k", "s")
    val neu = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[Exception] {
      ScaleOps.snapshotDiff(old, neu, Seq("k")).collect()
    }
    assert(e.getMessage.contains("duplicate key") ||
      e.getCause != null && e.getCause.getMessage.contains("duplicate key"))
  }

  test("rankBuckets equals ntile over unique keys, across fill-rule edges") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sizes straddling the fill rule: rem == 0, rem > 0, fewer rows than
    // buckets (q == 0), one row, and a partition count above the row count
    for (n <- Seq(1, 2, 3, 7, 30, 101); b <- Seq(3, 4, 8)) {
      val df = spark.range(n.toLong)
        .select((col("id") * 37 % 1000).as("k"), col("id").as("doc_id"))
      val expected = df.withColumn("bucket",
        ntile(b).over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      val got = ScaleOps.rankBuckets(df, Seq("k", "doc_id"), b,
        numPartitions = 5)
      assert(got.orderBy("doc_id").collect().toSeq ==
        expected.orderBy("doc_id").collect().toSeq,
        s"n=$n b=$b: rankBuckets must equal the ntile window")
    }
  }

  test("rankBuckets plans no partition-less window and no single-task sort") {
    import spark.implicits._
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val plan = ScaleOps.rankBuckets(df, Seq("l_extendedprice", "l_orderkey"),
      3, numPartitions = 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"rankBuckets must not plan a window:\n$plan")
  }

  test("scd2Apply: two applies build the full version chain") {
    import spark.implicits._
    def hist0(rows: Seq[(Long, String)]) = rows.toDF("k", "v")
      .withColumn("eff_from", lit(0L))
      .withColumn("eff_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val h0 = hist0(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // T=10: 1 renamed, 2 deleted, 4 inserted, 3 unchanged
    val h1 = ScaleOps.scd2Apply(h0,
      Seq((1L, "a2"), (3L, "c"), (4L, "d")).toDF("k", "v"), Seq("k"), 10L)
    // T=20: 1 renamed again, 4 deleted, 2 REBORN
    val h2 = ScaleOps.scd2Apply(h1,
      Seq((1L, "a3"), (2L, "b2"), (3L, "c")).toDF("k", "v"), Seq("k"), 20L)
    val got = h2.orderBy("k", "eff_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 0L, 10L, false), (1L, "a2", 10L, 20L, false),
      (1L, "a3", 20L, -1L, true),
      (2L, "b", 0L, 10L, false), (2L, "b2", 20L, -1L, true),
      (3L, "c", 0L, -1L, true),
      (4L, "d", 10L, 20L, false)),
      s"got ${got.toSeq}")
  }

  test("exactQuantiles equals the sorted-rank definition; edges covered") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select(col("l_extendedprice"))
    val qs = Seq(0.0, 0.01, 0.5, 0.9, 1.0)
    val got = ScaleOps.exactQuantiles(li, "l_extendedprice", qs, 7)
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val sorted = li.orderBy("l_extendedprice").collect().map(_.getDouble(0))
    val expected = qs.map(q =>
      (q, sorted(math.floor(q * (sorted.length - 1)).toInt)))
    assert(got.toSeq == expected,
      s"got ${got.toSeq} expected $expected")
    // one row, empty input, duplicate quantiles at the same rank
    val one = Seq(42.0).toDF("v")
    assert(ScaleOps.exactQuantiles(one, "v", Seq(0.0, 0.5, 1.0), 4)
      .collect().forall(_.getDouble(1) == 42.0))
    val empty = Seq.empty[Double].toDF("v")
    assert(ScaleOps.exactQuantiles(empty, "v", Seq(0.5), 4).isEmpty)
    val nulls = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    assert(ScaleOps.exactQuantiles(nulls, "v", Seq(1.0), 4)
      .head().getDouble(1) == 3.0, "NULLs excluded from the rank space")
  }

  test("snapshotDiff is a single shuffle of the union") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val neu = Seq((1L, "a"), (3L, "c")).toDF("k", "s")
    val plan = ScaleOps.snapshotDiff(old, neu, Seq("k"))
      .queryExecution.executedPlan.toString
    // union-tag-aggregate: one Exchange, no join operator anywhere
    assert(!plan.contains("Join"))
    assert("Exchange".r.findAllIn(plan).size <= 1 ||
      "Exchange hashpartitioning".r.findAllIn(plan).size <= 1)
  }

  test("sortedNeighborhoodPairs: exactly the rank-window pairs, across block seams") {
    import spark.implicits._
    val rows = Seq("delta", "alpha", "echo", "bravo", "golf", "charlie",
      "foxtrot").zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val w = 3
    val got = graft.ops.Linkage.sortedNeighborhoodPairs(
        rows.toDF("id", "key"), "id", "key", window = w, numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // reference: sort by (key, id), pair everything within w-1 positions
    val sorted = rows.sortBy(r => (r._2, r._1)).map(_._1)
    val expected = (for {
      i <- sorted.indices; j <- i + 1 until math.min(i + w, sorted.size)
    } yield (sorted(i), sorted(j))).toSet
    assert(got == expected,
      s"missing ${expected -- got}, extra ${got -- expected}")
  }

  test("weightedQuantile: weight-heavy values win; ties collapse; rational thresholds") {
    import spark.implicits._
    // median of {1(w1), 2(w1), 10(w8)} is 10 — the unweighted median is 2
    val a = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 10L, 8L))
      .toDF("grp", "v", "w")
    val med = ScaleOps.weightedQuantile(a, Seq("grp"), "v", "w").head()
    assert(med.getLong(1) == 10L && med.getLong(2) == 10L)
    // uniform 1..4: q=1/4 -> 1, q=1/2 -> 2, q=1 -> 4
    val u = Seq(1L, 2L, 3L, 4L).map(("g", _, 1L)).toDF("grp", "v", "w")
    def q(n: Long, d: Long) = ScaleOps.weightedQuantile(
      u, Seq("grp"), "v", "w", n, d).head().getLong(1)
    assert(q(1, 4) == 1L && q(1, 2) == 2L && q(1, 1) == 4L)
    // duplicate values collapse into one weight before the cumsum
    val t = Seq(("g", 2L, 1L), ("g", 2L, 1L), ("g", 1L, 1L))
      .toDF("grp", "v", "w")
    assert(ScaleOps.weightedQuantile(t, Seq("grp"), "v", "w")
      .head().getLong(1) == 2L)
    // fractional weights are rejected loudly (they used to truncate
    // silently, dropping w<1 rows and skewing the quantile)
    val frac = Seq(("g", 1L, 0.7), ("g", 2L, 1.5)).toDF("grp", "v", "w")
    val e = intercept[IllegalArgumentException] {
      ScaleOps.weightedQuantile(frac, Seq("grp"), "v", "w")
    }
    assert(e.getMessage.contains("integral"))
  }
}
