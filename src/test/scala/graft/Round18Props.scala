package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Property tests for the round-18 ops. The headline: the FW-BW TRIM
  * step must let [[graft.ops.WebGraph.stronglyConnectedComponents]]
  * complete on singleton-heavy graphs that the pivot rounds alone
  * cannot finish — the exact shape of a real web graph (Broder WWW'00:
  * most nodes are singleton-SCC tendrils/IN/OUT), and the r17 verdict's
  * named scale-killer.
  */
object Round18Props extends Properties("Round18Ops") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  property("SCC trim: 480 chain singletons feeding/fed-by a planted " +
    "3-cycle complete under maxRounds=8 where pivots alone need 120+ " +
    "rounds") = Prop.secure {
    import spark.implicits._
    // planted core s0->s1->s2->s0; 20 IN-chains of 12 nodes feeding s0
    // (trim peels each from its zero-in-degree head) and 20 OUT-chains
    // of 12 nodes fed by s2 (peeled from the zero-out-degree tail).
    // 483 nodes, 480 singleton SCCs. Without trim each pivot round
    // settles <= 4 nodes, needing ceil(480/4) = 120 rounds — the old
    // code raised maxRounds here; with trim the chains settle in 12
    // anti-join waves and one pivot round finishes the cycle.
    val core = Seq(("s0", "s1"), ("s1", "s2"), ("s2", "s0"))
    val chains = (0 until 20).flatMap { c =>
      val in = (0 until 11).map(i => (s"i${c}_$i", s"i${c}_${i + 1}")) :+
        (s"i${c}_11", "s0")
      val out = ("s2", s"o${c}_0") +:
        (0 until 11).map(i => (s"o${c}_$i", s"o${c}_${i + 1}"))
      in ++ out
    }
    val got = graft.ops.WebGraph.stronglyConnectedComponents(
        (core ++ chains).toDF("src", "dst"), "src", "dst",
        pivotsPerRound = 4, maxDepth = 16, maxRounds = 8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val coreOk = Seq("s0", "s1", "s2").forall(got(_) == "s0")
    val singles = got.view.filterKeys(k => !k.startsWith("s")).toMap
    val singlesOk = singles.size == 480 && singles.forall {
      case (n, comp) => comp == n }
    (got.size == 483) :| s"size ${got.size}" &&
      coreOk :| s"core labels ${Seq("s0", "s1", "s2").map(got)}" &&
      singlesOk :| "every chain node its own singleton SCC"
  }

  property("neighborhoodFunction: every emitted N(t) row is within the " +
    "p=9 small-range band of the exact pair count; effectiveDiameter " +
    "replays its own interpolation") = Prop.secure {
    import spark.implicits._
    // path p0->..->p5 feeding a 3-cycle: 9 nodes, max distance 8
    val edges = (0 until 5).map(i => (s"p$i", s"p${i + 1}")) ++
      Seq(("p5", "c0"), ("c0", "c1"), ("c1", "c2"), ("c2", "c0"))
    val nfDf = graft.ops.WebGraph.neighborhoodFunction(
      edges.toDF("src", "dst"), "src", "dst", maxT = 32, p = 9)
    val nf = nfDf.collect().map(r => r.getInt(0) -> r.getDouble(1))
      .sortBy(_._1)
    // exact closure on the driver: dist via BFS from each node
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    def ball(s: String): Map[String, Int] = {
      var dist = Map(s -> 0); var frontier = List(s); var d = 0
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj.getOrElse(_, Nil))
          .filterNot(dist.contains).distinct
        next.foreach(n => dist += n -> d); frontier = next
      }
      dist
    }
    val balls = nodes.map(n => n -> ball(n)).toMap
    def exactN(t: Int): Long =
      nodes.map(n => balls(n).count(_._2 <= t).toLong).sum
    val maxDist = balls.values.flatMap(_.values).max
    val tOk = nf.nonEmpty && nf.head._1 == 0 &&
      nf.map(_._1).toSeq == (0 to nf.last._1) && nf.last._1 <= maxDist
    // tiny balls -> linear-counting regime: estimates are tight
    val bandOk = nf.forall { case (t, est) =>
      math.abs(est / exactN(t).toDouble - 1.0) <= 0.05 }
    val eff = graft.ops.WebGraph.effectiveDiameter(nfDf, 0.9).head()
    // replay the interpolation from the collected table
    val nfFinal = nf.last._2
    val thr = 0.9 * nfFinal
    val (tHit, nfHit) = nf.find(_._2 >= thr).get
    val prev = nf.toMap.get(tHit - 1)
    val want = prev match {
      case None => tHit.toDouble
      case Some(pv) if nfHit - pv <= 0.0 => tHit.toDouble
      case Some(pv) => (tHit - 1).toDouble + (thr - pv) / (nfHit - pv)
    }
    // closeness family off the same registers: Lin's (R-1)^2/S per
    // node vs driver-exact inbound moments
    val lin = graft.ops.WebGraph.hyperballCloseness(
        edges.toDF("src", "dst"), "src", "dst", maxT = 32, p = 9)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val linOk = nodes.forall { v =>
      val reach = nodes.count(u => balls(u).contains(v))
      val total = nodes.flatMap(u => balls(u).get(v)).sum
      val exact = if (total > 0) (reach - 1.0) * (reach - 1.0) / total
                  else 0.0
      val (_, _, est) = lin(v)
      if (exact == 0.0) est == 0.0
      else math.abs(est / exact - 1.0) <= 0.15
    }
    tOk :| s"t range: ${nf.map(_._1).toSeq} maxDist=$maxDist" &&
      bandOk :| s"band: ${nf.map { case (t, e) =>
        (t, e, exactN(t)) }.toSeq}" &&
      (eff.getDouble(0) == want && eff.getInt(1) == tHit &&
        eff.getDouble(2) == nfFinal) :|
        s"eff=$eff want=$want tHit=$tHit" &&
      linOk :| s"lin closeness in band: $lin"
  }

  property("windowed drift serving: hdrWindowRead == direct build on " +
    "the window's rows; topkWindowRead == the leafCols build; evicting " +
    "expired days changes neither") = Prop.forAll(Gen.choose(1, 5)) {
    shift =>
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ops.Sketches
    val rows = for {
      d <- 1 to 25; i <- 1 to (d % 5) + 2
    } yield (d.toLong, ((i * d + shift) % 7 + 1).toLong,
      s"u${(i + d + shift) % 4}")
    val df = rows.toDF("day", "v", "u")
    def hdrSet(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def tkSet(x: org.apache.spark.sql.DataFrame) =
      x.select("item", "cnt", "tseen").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSet
    val hdrState = Sketches.hdrSketch(df, Seq("day"), "v", 8)
    val tkState = Sketches.topkSketch(df, Seq("day"), "u", 2)
    // frontier = day 25: recent window (18, 25], prior (11, 18]
    val checks = Seq((7, 0, 18L, 25L), (7, 7, 11L, 18L)).map {
      case (n, off, lo, hi) =>
        val winRows = df.filter(col("day") > lo && col("day") <= hi)
        val hdrOk = hdrSet(Sketches.hdrWindowRead(
            hdrState, Seq.empty, "day", n, off)) ==
          hdrSet(Sketches.hdrSketch(winRows, Seq.empty, "v", 8))
        val tkOk = tkSet(Sketches.topkWindowRead(
            tkState, Seq.empty, "day", n, off)) ==
          tkSet(Sketches.topkSketch(winRows, Seq.empty, "u", 2,
            leafCols = Seq("day")))
        hdrOk && tkOk
    }
    // eviction: days outside every served window (<= 11) drop freely
    val evOk = hdrSet(Sketches.hdrWindowRead(
        hdrState.filter(col("day") > 11L), Seq.empty, "day", 7, 7)) ==
      hdrSet(Sketches.hdrWindowRead(hdrState, Seq.empty, "day", 7, 7)) &&
      tkSet(Sketches.topkWindowRead(
        tkState.filter(col("day") > 11L), Seq.empty, "day", 7, 7)) ==
      tkSet(Sketches.topkWindowRead(tkState, Seq.empty, "day", 7, 7))
    checks(0) :| "recent window == direct build" &&
      checks(1) :| "prior window == direct build" &&
      evOk :| "eviction of expired days is invisible to window reads"
  }

  property("sccCondense weighted passthrough: parallel edge weights ADD " +
    "into the quotient mass, hand-computed; fractional weights raise") =
    Prop.secure {
    import spark.implicits._
    // SCCs: {a,b,c} -> 'a', {d,e} -> 'd', {f} -> 'f'; cross mass:
    // c->d 3 plus a parallel c->d 2 (adds to 5), e->f 7, a->f 1
    val edges = Seq(
      ("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("d", "e", 1L), ("e", "d", 1L),
      ("c", "d", 3L), ("c", "d", 2L), ("e", "f", 7L), ("a", "f", 1L))
    val df = edges.toDF("src", "dst", "w")
    val comps = graft.ops.WebGraph.stronglyConnectedComponents(
      df, "src", "dst", pivotsPerRound = 64, maxDepth = 16)
    val got = graft.ops.WebGraph.sccCondense(df, "src", "dst", comps,
        weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val want = Set(("a", "d", 1L, 5L), ("d", "f", 1L, 7L),
      ("a", "f", 1L, 1L))
    val bad = scala.util.Try {
      graft.ops.WebGraph.sccCondense(
        Seq(("x", "y", 2.5)).toDF("src", "dst", "w"), "src", "dst",
        Seq(("x", "x"), ("y", "y")).toDF("node", "component"),
        weightCol = Some("w")).collect()
    }
    (got == want) :| s"quotient $got" &&
      (bad.isFailure && bad.failed.get.getMessage != null) :|
        "fractional weight must raise"
  }

  property("Unigram trainer: hand-computed corpus (seed, Viterbi-EM " +
    "counts, floors, scores); encode == trainer segmentation; OOV " +
    "byte-fallback; training is layout-invariant") = Prop.secure {
    import spark.implicits._
    // corpus: 'ab' x3, 'cd' x1 -> charset {a,b,c,d}, vocabSize 6 keeps
    // both multis. EM: 'ab' segments as [ab] (ln(3/12) beats 2*ln(3/12)),
    // 'cd' as [cd]; counts ab=3, cd=1, singles floor at 1; round-2 total
    // = 8 -> scores ln(3/8) and ln(1/8)
    val docs = Seq("ab ab cd", "ab").toDF("text")
    val model = graft.ops.Unigram.train(docs, "text", vocabSize = 6,
      maxPieceLen = 2, seedFactor = 4, emRounds = 2)
    val got = model.map(p => (p.piece, p.cnt, p.score.doubleValue)).toSet
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    val cntOk = model.map(p => p.piece -> p.cnt).toMap ==
      Map("ab" -> 3L, "cd" -> 1L, "a" -> 1L, "b" -> 1L, "c" -> 1L,
        "d" -> 1L)
    val scoreOk = model.forall { p =>
      val want = if (p.piece == "ab") math.log(3.0 / 8.0)
      else math.log(1.0 / 8.0)
      close(p.score.doubleValue, want)
    }
    // encode: trained pieces win, OOV chars fall back to single tokens
    val enc = graft.ops.Unigram.encode(
        Seq("ab cd abcd xq").toDF("text"), "text", model)
      .select("unigram_tokens").head().getSeq[String](0).toList
    val encOk = enc == List("ab", "cd", "ab", "cd", "x", "q")
    // layout invariance: 7-way repartition trains the identical model
    val model7 = graft.ops.Unigram.train(docs.repartition(7), "text",
      vocabSize = 6, maxPieceLen = 2, seedFactor = 4, emRounds = 2)
    val layoutOk = model7.map(p => (p.piece, p.cnt, p.score)) ==
      model.map(p => (p.piece, p.cnt, p.score))
    cntOk :| s"counts ${model.map(p => p.piece -> p.cnt)}" &&
      scoreOk :| s"scores $got" &&
      encOk :| s"encode $enc" &&
      layoutOk :| "layout invariance"
  }

  property("SCC trim changes no labels: trimmed-path result == pivot-" +
    "only-sized result == Floyd-Warshall reference on random graphs " +
    "with dangling tails") = Prop.forAll(
      Gen.choose(3, 8), Gen.choose(2, 16), Gen.choose(1, 6)) {
    (n, m, tails) =>
    // random cyclic-ish core + guaranteed dangling tails so trim has
    // real work on every sample; labels must match the driver-side
    // transitive-closure reference exactly (trim settles a node iff
    // its SCC is a singleton, so output is invariant).
    val rng = new scala.util.Random(n * 1000003 + m * 1009 + tails)
    val es = (0 until m).map(_ =>
      (s"n${rng.nextInt(n)}", s"n${rng.nextInt(n)}")) ++
      (0 until tails).map(i => (s"n${rng.nextInt(n)}", s"t$i"))
    val simple = es.filter { case (a, b) => a != b }.distinct
    (simple.nonEmpty) ==> {
      import spark.implicits._
      val got = graft.ops.WebGraph.stronglyConnectedComponents(
          es.toDF("src", "dst"), "src", "dst",
          pivotsPerRound = 2, maxDepth = 32, maxRounds = 64)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // reuse the Floyd-Warshall closure reference from Round17Props
      val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val reach = Array.fill(nodes.size, nodes.size)(false)
      simple.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
      for (k <- nodes.indices; i <- nodes.indices; j <- nodes.indices)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val want = nodes.map { v =>
        v -> nodes.filter(u => u == v ||
          (reach(idx(v))(idx(u)) && reach(idx(u))(idx(v)))).min
      }.toMap
      (got == want) :| s"got=$got want=$want edges=$simple"
    }
  }
}
