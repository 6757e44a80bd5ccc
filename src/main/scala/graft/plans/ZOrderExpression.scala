package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression for the Morton (Z-order) interleave key —
  * the clustering expression [[graft.sinks.TableStore.writeZOrdered]]
  * sorts by. A native expression rather than a UDF for the same reason as
  * [[Base58Encode]]: it runs once per row over the full table during every
  * layout (re)write, and `doGenCode` keeps the bit-twiddling inside
  * whole-stage codegen with no closure or encoder round-trip.
  *
  * Accepts INT or LONG dimensions (buckets); see
  * [[graft.functions.ZOrder.interleave]] for the 31-bit contract. */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key requires integral inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.ZOrder.interleave(asLong(left, a), asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave((long) $a, (long) $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder_key"
}
