package graft.functions

/** Morton (Z-order) bit interleaving — the standard multi-dimensional
  * clustering key (Morton 1966; used publicly by Delta Lake OPTIMIZE
  * ZORDER, Databricks/Iceberg docs) that lets ONE sort order serve range
  * predicates on TWO dimensions at once: sorting by the interleaved key
  * keeps rows close in BOTH coordinates close in the file order, so
  * parquet row-group min/max stats stay tight on both columns and a box
  * query skips row groups on either predicate.
  *
  * Pure bit-twiddling (the classic mask-shift spread), no allocation —
  * safe to call from generated code ([[graft.plans.ZOrderKey]]).
  *
  * Contract: inputs are NON-NEGATIVE dimension buckets below 2^31 (mask
  * `& 0x7fffffff` is applied defensively, so larger/negative inputs wrap
  * rather than poison the sign bit of the key — callers wanting exact
  * semantics bucket their dimensions first). The result is non-negative:
  * bit 61 is the highest bit either 31-bit input can reach.
  */
object ZOrder {

  /** Spread the lower 32 bits of `v` onto the even bit positions 0,2,..62. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Collapse the even bit positions of `v` back into the lower 32 bits
    * (the inverse of [[spread]] — used by the round-trip spec). */
  def unspread(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >>> 1)) & 0x3333333333333333L
    v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >>> 16)) & 0x00000000ffffffffL
    v
  }

  /** Interleave two 31-bit dimension buckets: a's bits land on odd
    * positions (major), b's on even. Monotone in each argument when the
    * other is fixed. */
  def interleave(a: Long, b: Long): Long =
    (spread(a & 0x7fffffffL) << 1) | spread(b & 0x7fffffffL)

  /** First dimension back out of an interleaved key. */
  def dimA(z: Long): Long = unspread(z >>> 1)

  /** Second dimension back out of an interleaved key. */
  def dimB(z: Long): Long = unspread(z)
}
