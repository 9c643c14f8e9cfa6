package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Constant-zero partition key that the optimizer CANNOT fold away.
  *
  * Purpose: some window frames in this engine are bounded BY CONSTRUCTION
  * (a ≤topN post-limit frame, the k-step funnel report, a calendar-day
  * spine, an nBuckets plane, a |groups|-sized stats frame). A partition-less
  * window over them is correct and cheap, but `WindowExec` logs
  * "No Partition Defined for Window operation!" for every one — dozens of
  * warnings per bench sweep that bury any REAL unpartitioned-window
  * regression on an unbounded frame.
  *
  * `Window.partitionBy(lit(0))` does not help: the foldable literal is
  * eliminated from the partition spec during optimization and the warning
  * fires anyway (verified on Spark 4.1). This expression is deliberately
  * NON-FOLDABLE (`foldable` stays the `LeafExpression` default `false`)
  * while still being deterministic, non-null and constant — so the
  * partition spec survives optimization, every row hashes to the same
  * partition (execution is identical to the partition-less plan), and the
  * warning is silenced ONLY where the code explicitly declares the frame
  * bounded. A genuine scale smell still warns.
  */
case class BoundedKey() extends LeafExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.literal("0", IntegerType))
}
