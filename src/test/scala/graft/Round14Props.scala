package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Property tests for the round-14 analytics ops: each distributed plan
  * must agree with a direct single-machine reference implementation on
  * arbitrary small inputs — the interval-union rolling distinct, the
  * cross-multiplied weighted quantile, the CMS one-sided bound, and the
  * truncated-EWMA weights.
  */
object Round14Props extends Properties("Round14Ops") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  // --- rollingDistinctUsers vs the naive day-window count ------------------

  private val activityGen: Gen[List[(Long, Int)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(1L, 8L), Gen.choose(0, 40)))
  } yield rows

  property("rollingDistinctUsers == naive window count") =
    Prop.forAll(activityGen, Gen.oneOf(1, 3, 7)) { (rows, window) =>
      import spark.implicits._
      val ev = rows.map { case (u, day) =>
        (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
          .toLocalDateTime.plusDays(day.toLong)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss")))
      }.toDF("user_id", "s")
        .select(col("user_id"), to_timestamp(col("s")).as("ts"))
      val got = graft.ops.EventOps.rollingDistinctUsers(
          ev, "user_id", "ts", window)
        .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
      val act = rows.map { case (u, d) =>
        (u, java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong))
      }.toSet
      val days = act.map(_._2)
      val spine = {
        val lo = days.min
        val hi = days.max
        Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toList
      }
      val naive = spine.map { d =>
        d -> act.filter { case (_, ad) =>
          !ad.isAfter(d) && ad.isAfter(d.minusDays(window.toLong))
        }.map(_._1).size.toLong
      }.toMap
      (got == naive) :| s"got $got expected $naive"
    }

  // --- weightedQuantile vs the sorted cumulative reference -----------------

  private val wqGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(-20L, 20L), Gen.choose(1L, 9L)))
  } yield rows

  property("weightedQuantile == sorted cumulative reference") =
    Prop.forAll(wqGen, Gen.oneOf((1L, 2L), (1L, 4L), (3L, 4L), (1L, 1L))) {
      case (rows, (num, den)) =>
        import spark.implicits._
        val got = graft.ops.ScaleOps.weightedQuantile(
            rows.toDF("v", "w").withColumn("g", lit("g")),
            Seq("g"), "v", "w", num, den)
          .head()
        val total = rows.map(_._2).sum
        val sorted = rows.groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toList.sortBy(_._1)
        var cum = 0L
        val expected = sorted.collectFirst {
          case (v, w) if { cum += w; cum * den >= total * num } => v
        }.get
        (got.getLong(1) == expected && got.getLong(2) == total) :|
          s"got ${got.getLong(1)} expected $expected (q=$num/$den)"
    }

  // --- count-min never underestimates --------------------------------------

  private val cmsGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 200)
    rows <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"key$i"))
  } yield rows

  property("cmsEstimate >= exact for every key; mass conserved per row") =
    Prop.forAll(cmsGen) { keys =>
      import spark.implicits._
      val df = keys.toDF("k")
      val depth = 3
      val width = 16
      val sk = graft.ops.Sketches.cmsSketch(df, "k", depth, width)
      val mass = sk.groupBy("row").agg(sum("cnt")).collect()
        .map(_.getLong(1)).toSet
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = graft.ops.Sketches.cmsEstimate(
          sk, keys.distinct.toDF("k"), "k", depth, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oneSided = exact.forall { case (k, n) => est(k) >= n }
      (mass == Set(keys.size.toLong) && oneSided) :|
        s"mass $mass est $est exact $exact"
    }

  // --- ewmaSmooth vs the direct weighted reference --------------------------

  private val ewmaGen: Gen[List[Option[Double]]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(Option.empty[Double]),
      Gen.choose(-50.0, 50.0).map(v =>
        Some(math.rint(v * 100) / 100)))) // 2-decimal values: decimal-exact
  } yield rows

  property("ewmaSmooth == direct truncated-adjusted reference") =
    Prop.forAll(ewmaGen) { series =>
      import spark.implicits._
      val lags = 4
      val u = (0 until lags).map(i =>
        math.pow(3.0, i.toDouble).toLong *
          math.pow(4.0, (lags - 1 - i).toDouble).toLong)
      val ev = series.zipWithIndex.map { case (v, i) =>
        (1L, v, i.toLong * 10, i.toLong)
      }.toDF("user_id", "value", "us", "event_id")
      val got = graft.ops.EventOps.ewmaSmooth(ev, "user_id", "value",
          "us", "event_id", alphaNum = 1, alphaDen = 4, lags = lags)
        .orderBy("us").collect()
        .map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      val expected = series.indices.map { t =>
        val terms = (0 until lags).flatMap { i =>
          if (t - i < 0) None
          else series(t - i).map(v => (BigDecimal(v) * u(i), u(i)))
        }
        val den = terms.map(_._2).sum
        if (den == 0L) None
        else Some((terms.map(_._1).sum / den).toDouble)
      }
      val ok = got.toSeq.zip(expected).forall {
        case (None, None) => true
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case _ => false
      }
      ok :| s"got ${got.toSeq} expected $expected"
    }
}
