package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook: registers the engine's native expressions
  * with the session FunctionRegistry so `spark.sql("base58_encode(...)")`
  * codegens without a UDF. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or call
  * [[GraftExtensions.install]] on a builder).
  *
  * SURVEY §4 concluded no custom optimizer `Rule`/`SparkStrategy` is required
  * for parity — the extension surface carries only expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("base58_encode"),
      new ExpressionInfo(classOf[Base58Encode].getName, "base58_encode"),
      (args: Seq[Expression]) => Base58Encode(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("base58_decode"),
      new ExpressionInfo(classOf[Base58Decode].getName, "base58_decode"),
      (args: Seq[Expression]) => Base58Decode(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("waves_address"),
      new ExpressionInfo(classOf[WavesAddressFromPk].getName, "waves_address"),
      (args: Seq[Expression]) => WavesAddressFromPk(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("waves_address_from_pkh"),
      new ExpressionInfo(classOf[WavesAddressFromPkh].getName, "waves_address_from_pkh"),
      (args: Seq[Expression]) => WavesAddressFromPkh(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => VectorDot(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) => ZOrderKey(args.head, args(1))))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.GraftColumnBridge

  /** Register the native functions into an already-running session (the
    * `spark.sql.extensions` config only applies at session construction). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      new FunctionIdentifier("base58_encode"),
      new ExpressionInfo(classOf[Base58Encode].getName, "base58_encode"),
      (args: Seq[Expression]) => Base58Encode(args.head))
    registry.registerFunction(
      new FunctionIdentifier("base58_decode"),
      new ExpressionInfo(classOf[Base58Decode].getName, "base58_decode"),
      (args: Seq[Expression]) => Base58Decode(args.head))
    registry.registerFunction(
      new FunctionIdentifier("waves_address"),
      new ExpressionInfo(classOf[WavesAddressFromPk].getName, "waves_address"),
      (args: Seq[Expression]) => WavesAddressFromPk(args.head, args(1)))
    registry.registerFunction(
      new FunctionIdentifier("waves_address_from_pkh"),
      new ExpressionInfo(classOf[WavesAddressFromPkh].getName, "waves_address_from_pkh"),
      (args: Seq[Expression]) => WavesAddressFromPkh(args.head, args(1)))
    registry.registerFunction(
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => VectorDot(args.head, args(1)))
    registry.registerFunction(
      new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) => ZOrderKey(args.head, args(1)))
    registry.registerFunction(
      new FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      (args: Seq[Expression]) => HilbertKey(args.head, args(1)))
  }
  /** Column-level access to the native expressions (no registry needed). */
  def base58Encode(c: Column): Column = GraftColumnBridge.column(Base58Encode(GraftColumnBridge.expression(c)))
  def base58Decode(c: Column): Column = GraftColumnBridge.column(Base58Decode(GraftColumnBridge.expression(c)))
  def wavesAddress(pk: Column, chainId: Column): Column =
    GraftColumnBridge.column(WavesAddressFromPk(GraftColumnBridge.expression(pk), GraftColumnBridge.expression(chainId)))
  def wavesAddressFromPkh(pkh: Column, chainId: Column): Column =
    GraftColumnBridge.column(WavesAddressFromPkh(GraftColumnBridge.expression(pkh), GraftColumnBridge.expression(chainId)))
  def vectorDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def zorderKey(a: Column, b: Column): Column =
    GraftColumnBridge.column(ZOrderKey(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def hilbertKey(a: Column, b: Column): Column =
    GraftColumnBridge.column(HilbertKey(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  /** Row-local top-n nearest centroids (map-only cell assignment). */
  def nearestCells(vec: Column, cellIds: IndexedSeq[Int],
      centroids: IndexedSeq[IndexedSeq[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCells(GraftColumnBridge.expression(vec), cellIds, centroids, n))
  /** Same kernel under the squared-Euclidean metric — the PQ encode rule. */
  def nearestCellsL2(vec: Column, cellIds: IndexedSeq[Int],
      centroids: IndexedSeq[IndexedSeq[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCells(GraftColumnBridge.expression(vec), cellIds, centroids, n, l2 = true))
}
