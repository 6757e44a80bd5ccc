package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Base58

/** Native Catalyst expression for base58 encoding — the one per-row custom
  * function hot enough to justify promotion past a Scala UDF (SURVEY §2.9:
  * it runs on every id/address/attachment during conversion,
  * `convert.rs` uses it ~30×).
  *
  * Unlike a UDF this stays inside whole-stage codegen: no
  * encoder round-trip, no closure serialization — `doGenCode` emits a
  * static call on the deserialized binary directly.
  */
case class Base58Encode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"base58_encode requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Base58.encode(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Base58.encode($c))")

  override protected def withNewChildInternal(newChild: Expression): Base58Encode =
    copy(child = newChild)

  override def prettyName: String = "base58_encode_native"
}

/** Base58 decode as a native expression; invalid input yields NULL (mirrors
  * `bs58::decode(...).ok()` option semantics, `waves.rs:75-77`). */
case class Base58Decode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"base58_decode requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Base58.decode(input.asInstanceOf[UTF8String].toString).orNull

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val decoded = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, c => s"""
      scala.Option<byte[]> $decoded = graft.functions.Base58.decode($c.toString());
      if ($decoded.isDefined()) {
        ${ev.value} = (byte[]) $decoded.get();
      } else {
        ${ev.isNull} = true;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Base58Decode =
    copy(child = newChild)

  override def prettyName: String = "base58_decode_native"
}
