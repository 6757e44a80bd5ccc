package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over numeric arrays — the embedding-similarity
  * kernel (SURVEY §2.9 addendum; cosine = dot/(‖a‖·‖b‖), norm = √dot(a,a)).
  *
  * The builtin composition `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * codegen'd but materializes an intermediate products ARRAY per pair —
  * at brute-force scale (|Q|·|C| pairs × dim elements) that allocation
  * dominates. This expression is a single fused loop over the two
  * `ArrayData`, no intermediate, same left-to-right accumulation order as
  * the fold (bit-identical doubles, so oracle hashes are unchanged).
  *
  * Element types: both `array<double>` or both `array<float>` (floats are
  * widened to double BEFORE the multiply — matching DuckDB's
  * `embedding::DOUBLE[]` semantics). NULL elements are skipped (contribute
  * 0) rather than poisoning the sum; the engine's embedding columns are
  * non-null by construction, so the two conventions coincide everywhere the
  * expression is used.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires two arrays of float or two arrays of double, " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    } else while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $acc += (double) $a.$get($i) * (double) $b.$get($i);
          }
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}
