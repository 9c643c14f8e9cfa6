package graft

import scala.concurrent.Await
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.scalatest.funsuite.AnyFunSuite

/** The overlapped driver loops (SCC fwd/bwd, HyperBall estimate+verdict)
  * run on the global ForkJoin pool, whose threads predate any per-rep
  * `setJobGroup` — so Bench's circuit-breaker `cancelJobGroup` only reaches
  * their jobs if [[graft.ops.Par.grouped]] copies the submitting thread's
  * properties onto the pool thread.
  */
class ParSpec extends AnyFunSuite {

  test("Par.grouped carries the submitting thread's job group onto the " +
    "pool thread, and a cleared group does not leave a stale one behind") {
    val spark = SparkTestSession.spark
    val sc = spark.sparkContext
    // warm the pool OUTSIDE any group so its threads cannot have inherited
    // one at creation — the failure mode the helper exists to fix
    Await.result(graft.ops.Par.grouped(()), Duration.Inf)
    sc.setJobGroup("par-spec-group", "par spec", interruptOnCancel = true)
    try {
      val seen = Await.result(
        graft.ops.Par.grouped(sc.getLocalProperty("spark.jobGroup.id")),
        Duration.Inf)
      assert(seen == "par-spec-group",
        s"pool thread saw job group '$seen' instead of the caller's")
      val interrupt = Await.result(
        graft.ops.Par.grouped(
          sc.getLocalProperty("spark.job.interruptOnCancel")),
        Duration.Inf)
      assert(interrupt == "true")
    } finally sc.clearJobGroup()
    // after clearJobGroup, a pool thread polluted by the run above must
    // read NO group (null snapshot clears, it doesn't skip)
    val after = Await.result(
      graft.ops.Par.grouped(sc.getLocalProperty("spark.jobGroup.id")),
      Duration.Inf)
    assert(after == null, s"stale job group '$after' leaked on a pool thread")
  }
}
