package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH over two token arrays — the exact
  * kernel under ROUGE-L (Lin, "ROUGE: A Package for Automatic
  * Evaluation of Summaries", ACL 2004 WS): the classic O(n·m) dynamic
  * program with a two-row rolling buffer, run ONCE per row inside
  * whole-stage codegen (a Spark higher-order-function spelling of a DP
  * is impossible without per-cell lambda evaluation — the
  * interpreted-HOF trap; a native kernel is the house preference order
  * for scalar compute Spark lacks). NULL array → NULL; NULL elements
  * inside an array never match anything (a null token is absent data,
  * not a joinable value).
  *
  * Cost is quadratic in the shorter operand by construction — callers
  * bound their token windows (the q296 40-token convention) so per-row
  * work stays O(1) at corpus scale.
  */
object LcsKernel {

  /** LCS length; boxed for the NULL convention. */
  def lcsLen(a: ArrayData, b: ArrayData): java.lang.Integer = {
    if (a == null || b == null) return null
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return java.lang.Integer.valueOf(0)
    // materialize once — ArrayData.getUTF8String is not free inside the
    // O(n·m) loop
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      val ai = as(i)
      j = 0
      while (j < m) {
        cur(j + 1) =
          if (ai != null && bs(j) != null && ai.equals(bs(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    java.lang.Integer.valueOf(prev(m))
  }
}

/** (array<string>, array<string>) → int LCS length via
  * [[LcsKernel.lcsLen]]. Corpus-scale: codegen'd static-kernel call.
  */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got " +
          s"${a.catalogString} and ${b.catalogString}")
    }

  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = LcsKernel.lcsLen(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
    if (v == null) null else v.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Integer ${ev.value}_boxed =
       |  graft.functions.LcsKernel.lcsLen($a, $b);
       |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_boxed.intValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lcs_len"
}
