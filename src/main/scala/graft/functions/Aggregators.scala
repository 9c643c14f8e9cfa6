package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregator surface (SURVEY.md §2.10: `Aggregator[IN,BUF,OUT]`
  * registered via `functions.udaf`). The reference's user-code plane is
  * arbitrary Python; here custom aggregation is a typed, codegen-adjacent
  * Spark-native construct. `VarianceWelford` is the demonstration
  * instance: numerically stable one-pass variance whose merge is exact
  * under any partitioning (Chan et al. parallel variance), i.e. safe to
  * run distributed.
  */
object Aggregators {

  final case class VarBuf(n: Long, mean: Double, m2: Double)

  /** Welford/Chan one-pass sample variance. */
  object VarianceWelford extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      VarBuf(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: VarBuf, b: VarBuf): VarBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        VarBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }

    override def finish(r: VarBuf): Double =
      if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val varianceName = "graft_var_welford"

  /** Register the UDAF on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register(varianceName, udaf(VarianceWelford))

  def varWelford(c: Column): Column =
    org.apache.spark.sql.functions.call_udf(varianceName, c)
}
