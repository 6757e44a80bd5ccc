package graft.functions

/** Hilbert-curve index — the second space-filling-curve clustering key
  * next to [[ZOrder]] (Morton). Same job (one sort order serving range
  * predicates on two columns at once), better locality: the Hilbert curve
  * is CONTINUOUS — consecutive indices are always grid-adjacent (unit
  * step, proven in PlansSpec), where the Z curve takes long diagonal
  * jumps at power-of-two boundaries. Fewer jumps means each parquet
  * row-group's bounding box is tighter on average, so box reads skip at
  * least as well as Z-order (the published reason Hilbert is offered by
  * Delta Lake liquid clustering and Apache Iceberg as the successor to
  * OPTIMIZE ZORDER).
  *
  * Algorithm: the classic per-bit quadrant rotate/flip walk (Hilbert
  * 1891; the iterative xy2d/d2xy formulation is public, e.g. Wikipedia
  * "Hilbert curve", with the quadrant rotation applied at the CURRENT
  * bit scale in both directions — round-trip, bijectivity, and unit-step
  * locality are pinned by spec). Pure bit arithmetic, no allocation —
  * safe for generated code ([[graft.plans.HilbertKey]]).
  *
  * Contract mirrors [[ZOrder.interleave]]: non-negative dimension buckets
  * below 2^31 (defensively masked); the index is non-negative, below
  * 2^62. Width-normalize unbalanced dims exactly as for Z-order
  * ([[graft.sinks.TableStore.writeZOrdered]]'s contract / the auto
  * variant) — an unbalanced interleave degrades BOTH curves the same way.
  */
object Hilbert {

  val Order = 31

  /** (x, y) → Hilbert index d on the 2^31-cell-per-side grid. */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & 0x7fffffffL
    var y = y0 & 0x7fffffffL
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/flip the quadrant at scale s
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** d → (x, y): the inverse walk, used by the round-trip/locality spec. */
  def inverse(d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << Order)) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}
