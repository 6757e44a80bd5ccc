package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Waves

/** Native Catalyst expressions for Waves address derivation — the second
  * per-row custom kernel hot enough to justify promotion past a Scala UDF:
  * every transaction's `sender` runs blake2b256+keccak256+base58
  * (`waves.rs:35-50`), i.e. once per row across the whole 18-way
  * conversion. Staying inside whole-stage codegen removes the UDF's
  * encoder round-trip on the 32-byte key and the result string.
  */
case class WavesAddressFromPk(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"waves_address requires (BINARY, INT), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(pk: Any, chainId: Any): Any =
    UTF8String.fromString(
      Waves.addressFromPublicKey(pk.asInstanceOf[Array[Byte]], chainId.asInstanceOf[Int].toByte))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (pk, ch) =>
      s"UTF8String.fromString(graft.functions.Waves.addressFromPublicKey($pk, (byte) $ch))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WavesAddressFromPk =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "waves_address_native"
}

/** Address from a precomputed 20-byte public-key hash (`waves.rs:52-66`) —
  * the genesis/payment recipient payload (`convert.rs:258-285`). */
case class WavesAddressFromPkh(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"waves_address_from_pkh requires (BINARY, INT), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(pkh: Any, chainId: Any): Any =
    UTF8String.fromString(
      Waves.addressFromPublicKeyHash(pkh.asInstanceOf[Array[Byte]], chainId.asInstanceOf[Int].toByte))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (pkh, ch) =>
      s"UTF8String.fromString(graft.functions.Waves.addressFromPublicKeyHash($pkh, (byte) $ch))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WavesAddressFromPkh =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "waves_address_from_pkh_native"
}
