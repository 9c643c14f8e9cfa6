package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Property tests for the round-15 analytics ops: each distributed plan
  * must agree with a direct single-machine reference (or its analytic
  * invariant) on arbitrary small inputs — the winsorize clamp vs the
  * sorted reference, the HLL estimate band, the seasonal decomposition
  * identity, Bradley–Terry's fitted win probability, and the Markov
  * attribution share/ordering invariants.
  */
object Round15Props extends Properties("Round15Ops") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  // --- winsorize vs the sorted-reference clamp -----------------------------

  private val valsGen: Gen[List[Int]] =
    Gen.choose(2, 80).flatMap(n => Gen.listOfN(n, Gen.choose(-500, 500)))

  property("winsorize == sorted-reference clamp") =
    Prop.forAll(valsGen, Gen.oneOf((0.05, 0.95), (0.1, 0.8), (0.25, 0.75))) {
      (xs, pq) =>
        import spark.implicits._
        val (pLo, pHi) = pq
        val df = xs.map(_.toDouble).toDF("v")
        val got = graft.ops.Profile
          .winsorize(df, "v", pLo, pHi, numPartitions = 3)
          .select("v", "v_wins").collect()
          .map(r => (r.getDouble(0), r.getDouble(1))).sorted.toList
        val sorted = xs.map(_.toDouble).sorted
        val lo = sorted(math.floor(pLo * (xs.size - 1)).toInt)
        val hi = sorted(math.floor(pHi * (xs.size - 1)).toInt)
        val exp = xs.map(_.toDouble)
          .map(v => (v, math.min(math.max(v, lo), hi))).sorted
        (got == exp) :| s"got $got expected $exp (lo=$lo hi=$hi)"
    }

  // --- HLL estimate lands within the analytic band -------------------------

  property("hllDistinct within 4 standard errors at p=9") =
    Prop.forAll(Gen.choose(50, 5000), Gen.choose(0, 1000)) { (n, salt) =>
      import spark.implicits._
      val df = (1 to n).map(i => ("g", s"item_${salt}_$i")).toDF("g", "v")
      val est = graft.ops.Sketches.hllDistinct(df, Seq("g"), "v", p = 9)
        .head().getDouble(2)
      // σ = 1.04/sqrt(512) ≈ 4.6%; linear counting is tighter still
      val rel = math.abs(est / n - 1.0)
      (rel < 4 * 1.04 / math.sqrt(512.0)) :| s"n=$n est=$est rel=$rel"
    }

  // --- seasonal decomposition identity -------------------------------------

  private val seriesGen: Gen[List[Int]] =
    Gen.choose(9, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0, 30)))

  property("seasonalDecompose: trend+seasonal+remainder reconstructs value (to IEEE ulp) on interior days") =
    Prop.forAll(seriesGen) { counts =>
      import spark.implicits._
      // day t gets counts(t) events (clamped — shrinking escapes the
      // generator range; day 0 and last day forced nonempty so the
      // spine spans exactly the generated series)
      val clamped = counts.map(c => c.max(0).min(30))
      val fixed =
        if (clamped.isEmpty) List(1)
        else clamped.updated(0, clamped.head.max(1))
          .updated(clamped.size - 1, clamped.last.max(1))
      val rows = fixed.zipWithIndex.flatMap { case (c, t) =>
        (0 until c).map(k => java.time.LocalDate.ofEpochDay(19000L + t)
          .toString + f" ${k % 24}%02d:00:00")
      }
      val ev = rows.toDF("s").select(to_timestamp(col("s")).as("ts"))
      val got = graft.ops.EventOps.seasonalDecompose(ev, "ts", period = 7)
        .collect()
      (got.length == fixed.size) :| s"spine ${got.length} vs ${fixed.size}" &&
        Prop.all(got.map { r =>
          val v = r.getLong(2)
          val t = (r.getDate(0).toLocalDate.toEpochDay - 19000L).toInt
          if (r.isNullAt(3)) (v == fixed(t).toLong) :| "edge value intact"
          else {
            val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
            // remainder is DEFINED as the exact IEEE leftover
            // (v−trend)−seasonal; recomposing in the other association
            // order re-rounds, so the identity holds to rounding error
            (math.abs(recon - v.toDouble) < 1e-9) :|
              s"identity broke at ${r.getDate(0)}: $recon vs $v"
          }
        }: _*)
    }

  // --- Bradley–Terry recovers the empirical two-item win rate --------------

  property("bradleyTerry two-item fit matches the empirical win rate") =
    Prop.forAll(Gen.choose(1, 30), Gen.choose(1, 30)) { (wa, wb) =>
      import spark.implicits._
      val o = (Seq.fill(wa)(("a", "b")) ++ Seq.fill(wb)(("b", "a")))
        .toDF("w", "l")
      val got = graft.ops.Preference.bradleyTerry(o, "w", "l")
        .orderBy("item").collect()
      val (pa, pb) = (got(0).getDouble(4), got(1).getDouble(4))
      // MM fixed point for 2 items: π_a/(π_a+π_b) = wa/(wa+wb)
      val fitted = pa / (pa + pb)
      val emp = wa.toDouble / (wa + wb)
      (math.abs(fitted - emp) < 1e-6) :| s"fitted $fitted vs empirical $emp" &&
        (math.max(pa, pb) == 1.0) :| s"top must sit at exactly 1: $pa/$pb"
    }

  // --- Markov attribution invariants ---------------------------------------

  private val journeyGen: Gen[List[(Long, String)]] = for {
    nUsers <- Gen.choose(2, 12)
    rows <- Gen.sequence[List[List[(Long, String)]], List[(Long, String)]](
      (1 to nUsers).toList.map { u =>
        Gen.choose(1, 6).flatMap(len => Gen.listOfN(len,
          Gen.oneOf("a", "b", "c", "conv")).map(_.zipWithIndex.map {
            case (t, _) => (u.toLong, t)
          }))
      }).map(_.flatten)
  } yield rows

  property("markovAttribution: p_removed <= p_full, shares sum to 1") =
    Prop.forAll(journeyGen) { rows =>
      import spark.implicits._
      val ev = rows.zipWithIndex.map { case ((u, t), i) =>
        (u, t, i.toLong * 10L, i.toLong)
      }.toDF("u", "t", "us", "tie")
      val got = graft.ops.EventOps.markovAttribution(
        ev, "u", "t", "us", "tie", convType = "conv").collect()
      Prop.all((got.map { r =>
        ((r.getDouble(2) <= r.getDouble(1) + 1e-12) :|
          s"removal must not raise conversion: $r"): Prop
      } :+ {
        val shares = got.flatMap(r =>
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
        (shares.isEmpty || math.abs(shares.sum - 1.0) < 1e-9) :|
          s"shares ${shares.toList} must sum to 1"
      }): _*)
    }
}
