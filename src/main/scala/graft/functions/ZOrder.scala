package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving of two non-negative dimension keys. */
object BitKernels {
  /** Interleave the low 31 bits of each key: bit i of `a` lands at 2i, of
    * `b` at 2i+1 — a 62-bit Morton code. Rows sorted by the code cluster
    * in BOTH dimensions simultaneously, so parquet row-group min/max stats
    * become selective for predicates on either column. */
  def interleave2(a: Long, b: Long): Long = {
    // keys >= 2^31 would silently alias (only the low 31 bits interleave),
    // destroying clustering quality — reject rather than degrade quietly
    require(a >= 0 && b >= 0, "zorder2 requires non-negative keys")
    require(a < (1L << 31) && b < (1L << 31),
      "zorder2 keys must fit in 31 bits; pre-scale or hash wider keys")
    var r = 0L
    var i = 0
    while (i < 31) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }
}

/** zorder2(a, b): 62-bit Morton code of two non-negative integer keys —
  * the multi-column clustering sort key for layout writes
  * (sources.Clustering). Codegen, one expression per row at write time. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires two bigint inputs")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitKernels.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
