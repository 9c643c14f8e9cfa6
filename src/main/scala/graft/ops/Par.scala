package graft.ops

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Spark-aware `Future` wrapper for the overlapped driver loops (SCC
  * fwd/bwd reach, HyperBall estimate + exact verdict).
  *
  * Spark's job-group / description properties are `InheritableThreadLocal`s,
  * copied only at thread CREATION — work shipped to the long-lived global
  * ForkJoin pool runs on threads created before the caller's `setJobGroup`
  * and silently escapes the group, so a `cancelJobGroup` (Bench's per-rep
  * circuit breaker) cannot reach the jobs it launches: a timed-out lane
  * would keep consuming executors and pollute every lane after it.
  * [[grouped]] snapshots the submitting thread's properties and re-applies
  * them inside the pooled thread before running the body (a `null` value
  * clears the property, so stale groups from a reused pool thread cannot
  * leak in either).
  */
private[graft] object Par {
  private val Keys = Seq(
    "spark.jobGroup.id", "spark.job.description", "spark.job.interruptOnCancel")

  def grouped[T](body: => T)(implicit ec: ExecutionContext): Future[T] = {
    val sc = SparkSession.active.sparkContext
    val props = Keys.map(k => k -> sc.getLocalProperty(k))
    Future {
      props.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      body
    }
  }
}
