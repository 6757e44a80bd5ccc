package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Row-local nearest-centroid selection — the map-only cell assignment of
  * the IVF/k-means paths (VERDICT r4 #1). The centroid matrix (bounded by
  * construction: numCells × dim doubles) rides the expression as a plan
  * constant — the same driver-side collection the old
  * `crossJoin(broadcast(centroids))` performed — and each input vector
  * computes its `n` nearest cells in ONE kernel pass: k fused dot products,
  * a top-n insertion, zero expansion, zero Exchange. The replaced plan
  * expanded the corpus ×k and then SHUFFLED the expansion through a
  * `Window.partitionBy(id)` row_number to take the per-vector argmax.
  *
  * Ordering replicates the window's exactly: cosine descending under
  * Spark's SQL double ordering (NaN greatest, −0.0 == 0.0), ties broken by
  * ascending cell id (`cellIds` must be sorted ascending — the constructor
  * requires it). Cosine = dot/(‖v‖·‖c‖) with the same left-to-right
  * double accumulation as [[VectorDot]], so scores are bit-identical to
  * the replaced plan's. Null input → null (embedding columns are non-null
  * by construction, as for [[VectorDot]]).
  *
  * `l2 = true` switches the metric to squared-Euclidean argmin — the
  * product-quantization encode rule (codewords minimize RECONSTRUCTION
  * error, so magnitude matters; cosine would ignore it). The kernel ranks
  * by `2·dot(v,c) − ‖c‖²` — exactly `−(‖c‖² − 2·dot)`, the negation of
  * the distance-sans-‖v‖² the SQL oracle orders ascending; negation is
  * exact in IEEE754, so ties and order are bit-identical to the oracle's
  * `ORDER BY cc − 2·dot ASC, cell_id`.
  */
case class NearestCells(
    child: Expression,
    cellIds: IndexedSeq[Int],
    centroids: IndexedSeq[IndexedSeq[Double]],
    n: Int,
    l2: Boolean = false) extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == cellIds.length && n >= 1,
    s"need >=1 centroids matching cellIds and n>=1: ${centroids.length}/${cellIds.length}/$n")
  require(cellIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "cellIds must be strictly ascending (the tie-break order)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires an array of float or double, got ${t.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val mats: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  /** cosine: ‖c‖ per cell; l2: ‖c‖² per cell. */
  @transient private lazy val cnorms: Array[Double] = mats.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    if (l2) acc else math.sqrt(acc)
  }
  @transient private lazy val ids: Array[Int] = cellIds.toArray

  override protected def nullSafeEval(a: Any): Any =
    NearestCells.topCells(a.asInstanceOf[ArrayData], isFloat, mats, cnorms, ids, n, l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", mats, "double[][]")
    val cn = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val ci = ctx.addReferenceObj("cellIds", ids, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NearestCells.topCells($c, $isFloat, $m, $cn, $ci, $n, $l2);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

object NearestCells {
  /** Spark SQL double ordering: −0.0 == 0.0, NaN greatest (SQLOrderingUtil). */
  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  def topCells(
      v: ArrayData,
      isFloat: Boolean,
      cents: Array[Array[Double]],
      cnorms: Array[Double],
      cellIds: Array[Int],
      n: Int,
      l2: Boolean = false): ArrayData = {
    val vn = v.numElements()
    var nv = 0.0
    var i = 0
    if (!l2) { // ‖v‖ only feeds the cosine denominator
      if (isFloat) while (i < vn) {
        if (!v.isNullAt(i)) { val x = v.getFloat(i).toDouble; nv += x * x }; i += 1
      } else while (i < vn) {
        if (!v.isNullAt(i)) { val x = v.getDouble(i); nv += x * x }; i += 1
      }
    }
    val normV = math.sqrt(nv)
    val k = cents.length
    val take = math.min(n, k)
    // best-first selection buffer; scanning cells in ascending-cellId order
    // makes ties resolve to the lower cell id (strict > to displace)
    val selIdx = new Array[Int](take)
    val selSim = new Array[Double](take)
    var selN = 0
    var j = 0
    while (j < k) {
      val c = cents(j)
      val m = math.min(vn, c.length)
      var acc = 0.0
      var t = 0
      if (isFloat) while (t < m) {
        if (!v.isNullAt(t)) acc += v.getFloat(t).toDouble * c(t); t += 1
      } else while (t < m) {
        if (!v.isNullAt(t)) acc += v.getDouble(t) * c(t); t += 1
      }
      // l2: rank by 2·dot − ‖c‖² (== −(squared distance − ‖v‖²): the
      // per-row ‖v‖² offset is constant, so the argsort is the L2 one)
      val sim = if (l2) 2.0 * acc - cnorms(j) else acc / (normV * cnorms(j))
      if (selN < take || cmp(sim, selSim(selN - 1)) > 0) {
        var pos = if (selN < take) selN else take - 1
        while (pos > 0 && cmp(sim, selSim(pos - 1)) > 0) {
          selSim(pos) = selSim(pos - 1); selIdx(pos) = selIdx(pos - 1); pos -= 1
        }
        selSim(pos) = sim
        selIdx(pos) = j
        if (selN < take) selN += 1
      }
      j += 1
    }
    val out = new Array[Int](selN)
    i = 0
    while (i < selN) { out(i) = cellIds(selIdx(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
