package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Property tests for the round-16 ops: the distributed BFS centralities
  * must EQUAL a driver-side replay of the same exact integer arithmetic
  * on arbitrary small directed graphs (all nodes sampled, so the sample
  * rule is out of the way); the signed HDR adapter must keep the exact
  * merge law and the quantile lower-bound under arbitrary affine
  * transforms; the incremental session sink must equal one batch
  * sessionStats pass under an arbitrary time-threshold split.
  */
object Round16Props extends Properties("Round16Ops") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val Scale = 1000000000000L

  /** Random small directed graph as an edge list over nodes n0..n{k-1}
    * (self-loops generated on purpose — the ops must drop them).
    */
  private val graphGen: Gen[(Int, List[(Int, Int)])] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 25)
    es <- Gen.listOfN(m,
      Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
  } yield (n, es)

  /** Driver-side multi-source BFS in the op's exact arithmetic:
    * per source, (dist, sigma) maps, level-synchronous.
    */
  private def refBfs(adj: Map[Int, Set[Int]], nodes: Seq[Int])
      : Map[Int, (Map[Int, Int], Map[Int, Long])] =
    nodes.map { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        val next = scala.collection.mutable.Map.empty[Int, Long]
        frontier.foreach { u =>
          adj.getOrElse(u, Set.empty).foreach { v =>
            if (!dist.contains(v))
              next(v) = next.getOrElse(v, 0L) + sigma(u)
          }
        }
        next.foreach { case (v, sg) => dist(v) = d; sigma(v) = sg }
        frontier = next.keys.toSeq
      }
      s -> (dist.toMap, sigma.toMap)
    }.toMap

  property("betweennessCentrality == driver Brandes in the same scaled integers") =
    Prop.forAll(graphGen) { case (n, esRaw) =>
      import spark.implicits._
      val es = esRaw.filter(e => e._1 != e._2).distinct
      (es.nonEmpty) ==> {
        val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val bfs = refBfs(adj, nodes)
        val bc = scala.collection.mutable.Map.empty[Int, Long]
        nodes.foreach { s =>
          val (dist, sigma) = bfs(s)
          val maxD = dist.values.max
          val delta = scala.collection.mutable.Map.empty[Int, Long]
          for (lvl <- (maxD - 1) to 0 by -1)
            dist.collect { case (v, d) if d == lvl => v }.foreach { v =>
              val t = adj.getOrElse(v, Set.empty).toSeq
                .filter(w => dist.get(w).contains(lvl + 1))
                .map { w =>
                  (BigInt(sigma(v)) * BigInt(Scale + delta.getOrElse(w, 0L))
                    / BigInt(sigma(w))).toLong
                }.sum
              delta(v) = t
            }
          delta.foreach { case (v, dl) =>
            if (v != s) bc(v) = bc.getOrElse(v, 0L) + dl
          }
        }
        val got = graft.ops.WebGraph.betweennessCentrality(
            es.map { case (a, b) => (s"n$a", s"n$b") }.toDF("s", "d"),
            "s", "d", nSources = 64, maxDepth = 16)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exp = nodes.map(v => s"n$v" -> bc.getOrElse(v, 0L)).toMap
        (got == exp) :| s"edges=$es got=$got expected=$exp"
      }
    }

  property("harmonicCloseness == driver reciprocal-distance sums") =
    Prop.forAll(graphGen) { case (n, esRaw) =>
      import spark.implicits._
      val es = esRaw.filter(e => e._1 != e._2).distinct
      (es.nonEmpty) ==> {
        val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val bfs = refBfs(adj, nodes)
        val h = scala.collection.mutable.Map.empty[Int, Long]
        nodes.foreach { s =>
          bfs(s)._1.foreach { case (v, d) =>
            if (d > 0) h(v) = h.getOrElse(v, 0L) + Scale / d
          }
        }
        val got = graft.ops.WebGraph.harmonicCloseness(
            es.map { case (a, b) => (s"n$a", s"n$b") }.toDF("s", "d"),
            "s", "d", nSources = 64, maxDepth = 16)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exp = nodes.map(v => s"n$v" -> h.getOrElse(v, 0L)).toMap
        (got == exp) :| s"edges=$es got=$got expected=$exp"
      }
    }

  // --- signed HDR adapter laws ---------------------------------------------

  private val signedGen: Gen[(List[Double], Long)] = for {
    k <- Gen.choose(5, 120)
    xs <- Gen.listOfN(k, Gen.choose(-50000, 50000))
    scale <- Gen.oneOf(1L, 10L, 1000L)
  } yield (xs.map(_ / 100.0), scale)

  property("hdrSigned: merge of an arbitrary 3-split == direct build; " +
    "quantile rational lower-bounds the exact quantile") =
    Prop.forAll(signedGen, Gen.choose(0, 2)) { case ((xs, scale), rot) =>
      import spark.implicits._
      val m = 16
      val off = xs.map(v => math.floor(v * scale).toLong).min - 7L
      val df = xs.toDF("v").withColumn("g", lit("g"))
      val direct = graft.ops.Sketches
        .hdrSketchSigned(df, Seq("g"), "v", m, scale, off)
      val parts = Seq(0, 1, 2).map(i =>
        xs.zipWithIndex.filter(t => (t._2 + rot) % 3 == i).map(_._1))
      val sketches = parts.map {
        case Nil => direct.limit(0)
        case p => graft.ops.Sketches.hdrSketchSigned(
          p.toDF("v").withColumn("g", lit("g")), Seq("g"), "v",
          m, scale, off)
      }
      val tree = graft.ops.Sketches.hdrMergeSigned(Seq("g"),
        graft.ops.Sketches.hdrMergeSigned(Seq("g"), sketches(0), sketches(1)),
        sketches(2))
      val dSet = direct.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val tSet = tree.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val q = graft.ops.Sketches
        .hdrQuantileSigned(direct, Seq("g"), m, 1L, 2L).head()
      val rational = q.getLong(2).toDouble / q.getLong(3)
      val exact = xs.sorted.apply(
        (math.ceil(xs.size / 2.0) - 1).toInt.max(0))
      ((tSet == dSet) :| s"merge $tSet != direct $dSet") &&
        ((rational <= exact + 1e-9) :|
          s"q50 $rational not a lower bound of $exact (scale=$scale)")
    }

  // --- BH step-up vs driver reference ---------------------------------------

  property("bhFdr == driver-side Benjamini–Hochberg on arbitrary p frames") =
    Prop.forAll(
      Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 1000000).map(_ / 1000000.0)))) { ps =>
      import spark.implicits._
      val named = ps.zipWithIndex.map { case (p, i) => (f"t$i%03d", p) }
      val got = graft.ops.Profile.bhFdr(
          named.toDF("test", "p"), Seq("test"), "p", 1L, 20L)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4),
          r.getBoolean(3))).toMap
      // reference: sort by (p, name); k* = max{i : p_i*m <= i*alpha};
      // p_adj = reverse running min of min(1, m*p_i/i)
      val m = named.size
      val sorted = named.sortBy(t => (t._2, t._1))
      val kmax = (1 to m).filter(i => sorted(i - 1)._2 * m * 20 <= i * 1)
        .lastOption.getOrElse(0)
      val rawAdj = sorted.zipWithIndex
        .map { case ((_, p), i0) => math.min(1.0, p * m / (i0 + 1)) }
      val adj = rawAdj.scanRight(Double.MaxValue)(math.min).init
      val exp = sorted.zipWithIndex.map { case ((nm, _), i0) =>
        nm -> ((i0 + 1).toLong, adj(i0), i0 + 1 <= kmax)
      }.toMap
      (got == exp) :| s"ps=$ps got=$got expected=$exp"
    }

  // --- incremental session sink == one batch pass under any split ----------

  private val eventsGen: Gen[(List[(Long, Long)], Long)] = for {
    nu <- Gen.choose(1, 4)
    evs <- Gen.listOfN(30, Gen.zip(Gen.choose(0L, nu.toLong - 1),
      Gen.choose(0L, 40L)))
    cut <- Gen.choose(5L, 35L)
  } yield (evs.map { case (u, t) => (u, t * 100L) }
    .groupBy(identity).keys.toList.sortBy(t => (t._2, t._1)), cut * 100L)

  property("sessionSink split at any time threshold == batch sessionStats") =
    Prop.forAll(eventsGen) { case (evs, cutUs) =>
      import spark.implicits._
      (evs.nonEmpty) ==> {
        val rows = evs.zipWithIndex
          .map { case ((u, us), i) => (u, us, i.toLong, (i % 7) * 0.5) }
        val (b1, b2) = rows.partition(_._2 <= cutUs)
        val in = java.nio.file.Files.createTempDirectory("graft-sp-in")
        val tgt = java.nio.file.Files.createTempDirectory("graft-sp-t").toString
        val ck = java.nio.file.Files.createTempDirectory("graft-sp-c").toString
        def wave(rs: Seq[(Long, Long, Long, Double)]): Unit = {
          if (rs.nonEmpty)
            rs.toDF("user_id", "us", "event_id", "value").coalesce(1)
              .write.mode("append").parquet(in.toString)
          graft.streaming.StreamingIngest.sessionSink(spark,
            spark.readStream
              .schema("user_id BIGINT, us BIGINT, event_id BIGINT, value DOUBLE")
              .parquet(in.toString),
            "user_id", "us", "event_id", "value", 300L, tgt, ck,
            nBuckets = 4)
          ()
        }
        wave(b1); wave(b2)
        val got = graft.streaming.StreamingIngest
          .readSessionTarget(spark, tgt)
          .select("user_id", "session_seq", "start_us", "end_us",
            "n_events", "sum_value")
          .as[(Long, Long, Long, Long, Long, Double)]
          .collect().sorted.toList
        val exp = graft.ops.EventOps.sessionStats(
            rows.toDF("user_id", "us", "event_id", "value"),
            "user_id", "us", "event_id", "value", 300L)
          .select("user_id", "session_seq", "start_us", "end_us",
            "n_events", "sum_value")
          .as[(Long, Long, Long, Long, Long, Double)]
          .collect().sorted.toList
        (got == exp) :| s"cut=$cutUs got=$got expected=$exp"
      }
    }
}
