package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression for the Hilbert-curve clustering key — the
  * [[ZOrderKey]] twin over [[graft.functions.Hilbert.index]] (same
  * rationale: runs once per row over the full table during a layout
  * write, so `doGenCode` keeps the bit walk inside whole-stage codegen
  * with no closure or encoder round-trip). */
case class HilbertKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key requires integral inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.Hilbert.index(asLong(left, a), asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Hilbert.index((long) $a, (long) $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_key"
}
