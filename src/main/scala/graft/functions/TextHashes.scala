package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels for text sketching.
  *
  * The declarative spelling of shingling —
  * `transform(sequence(...), i -> array_join(slice(tokens, i, n), ' '))` —
  * materializes every n-gram as a new string through interpreted
  * higher-order functions; at sf0.1 that alone dominated the dedup
  * operators. These kernels never build shingle strings: an n-gram is the
  * mixed 64-bit hash of its token hashes, and MinHash/SimHash fold directly
  * over those longs. Each document's sketch is computed IN ONE PROJECTION —
  * no explode, no groupBy, no shuffle — which is the property that matters
  * at corpus scale (signature computation embarrassingly parallel over
  * rows; only the band bucket-join shuffles).
  *
  * All constants are fixed → results are deterministic across runs,
  * partitionings, and cluster sizes.
  */
object TextHashKernels {

  private final val GOLDEN = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def tokenHash(t: UTF8String): Long = {
    // murmur3 over the utf8 bytes, widened + mixed to 64 bits
    val h32 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42)
    mix64(h32.toLong ^ (t.numBytes.toLong << 32))
  }

  /** One 64-bit hash per token n-gram (n=1 → per-token hashes). */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    val m = total - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](total)
    var i = 0
    while (i < total) {
      th(i) = if (tokens.isNullAt(i)) 0L else tokenHash(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = GOLDEN
      var w = 0
      while (w < n) { h = mix64(h ^ th(j + w)) + (w + 1) * GOLDEN; w += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  // k affine hash families g_i(x) = mix64(A_i * x + B_i); constants from a
  // fixed seed so signatures are reproducible everywhere
  private final val MaxK = 128
  private val (hashA, hashB) = {
    val rnd = new java.util.SplittableRandom(42L)
    (Array.fill(MaxK)(rnd.nextLong() | 1L), Array.fill(MaxK)(rnd.nextLong()))
  }

  /** k-minima MinHash signature over precomputed shingle hashes. */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val g = mix64(hashA(i) * hashes.getLong(j) + hashB(i))
        if (g < best) best = g
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over precomputed token/shingle hashes. */
  def simhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = hashes.numElements()
    var j = 0
    while (j < m) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** tokens array<string> → array<bigint> of n-gram hashes. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** shingle hashes array<bigint> → MinHash signature array<bigint> (length k). */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 128, "numHashes must be in [1,128]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** token hashes array<bigint> → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
