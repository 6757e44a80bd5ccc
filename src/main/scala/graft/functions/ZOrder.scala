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

  /** Is the point encoded by `z` inside the box? */
  def inBox(z: Long, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Boolean = {
    val a = dimA(z); val b = dimB(z)
    a >= aLo && a <= aHi && b >= bLo && b <= bHi
  }

  /** BIGMIN (Tropf & Herzog 1981, the standard Z-range-search jump): the
    * SMALLEST interleaved key ≥ `zStart` whose decoded point lies inside
    * the box, or -1 if none exists. This is what turns a Z-clustered file
    * manifest into an index: a file covering the contiguous key interval
    * [zlo, zhi] can contain a box row iff `bigminAtLeast(zlo, box) <=
    * zhi` — an O(64) bit walk per file, no decode-and-scan.
    *
    * Bit walk from the top: at each position, compare the probe's bit
    * against the box's min/max keys restricted to that bit's DIMENSION;
    * when the probe exits the box low, jump to the box's smallest key
    * with this prefix ("10…0" load); when the box's upper half is cut
    * off, tighten the max ("01…1" load); when the probe exits high, the
    * best candidate so far is the answer. Dimension-aware loads touch
    * only the bits of the dimension that owns the position. */
  def bigminAtLeast(zStart: Long, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long = {
    if (inBox(zStart, aLo, aHi, bLo, bHi)) return zStart
    var zmin = interleave(aLo, bLo)
    var zmax = interleave(aHi, bHi)
    var bigmin = -1L
    var pos = 62
    while (pos >= 0) {
      val dimMask = if ((pos & 1) == 1) 0xAAAAAAAAAAAAAAAAL else 0x5555555555555555L
      val lowerDim = dimMask & ((1L << pos) - 1)
      val zb = (zStart >>> pos) & 1L
      val minb = (zmin >>> pos) & 1L
      val maxb = (zmax >>> pos) & 1L
      ((zb << 2) | (minb << 1) | maxb) match {
        case 0L => // 0,0,0: agree, continue
        case 1L => // 0,0,1: candidate = min with this bit forced up;
          // search continues in the lower half
          bigmin = (zmin & ~(lowerDim | (1L << pos))) | (1L << pos)
          zmax = (zmax & ~(1L << pos)) | lowerDim
        case 3L => // 0,1,1: whole remaining box is above the probe
          return zmin
        case 4L => // 1,0,0: probe is above the whole remaining box
          return bigmin
        case 5L => // 1,0,1: restrict to the upper half
          zmin = (zmin & ~(lowerDim | (1L << pos))) | (1L << pos)
        case 7L => // 1,1,1: agree, continue
        case _ => // 0,1,0 / 1,1,0: min > max in one dimension — impossible
          throw new IllegalStateException(s"BIGMIN bit state at $pos")
      }
      pos -= 1
    }
    // walked every bit without exiting: zStart itself would have been in
    // the box (handled above), so the candidate is the answer
    bigmin
  }

  /** Can a file covering the contiguous key interval [zLo, zHi] contain
    * any row of the box? The manifest-pruning predicate. */
  def rangeIntersectsBox(
      zLo: Long, zHi: Long, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Boolean = {
    require(aLo <= aHi && bLo <= bHi,
      s"inverted box: a=[$aLo,$aHi] b=[$bLo,$bHi]")
    val m = bigminAtLeast(zLo, aLo, aHi, bLo, bHi)
    m >= 0 && m <= zHi
  }

  /** Exactly the Z-buckets (key intervals of width 2^shift) that can
    * contain a row of the box — the driver-side index walk behind
    * [[graft.sinks.TableStore.readZBucketBox]]: hop bucket-to-bucket with
    * [[bigminAtLeast]], O(matching buckets · 64 bit-steps), never a scan
    * of the bucket space. */
  def bucketsForBox(shift: Int, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Seq[Long] = {
    require(shift >= 0 && shift < 63, s"shift out of range: $shift")
    // an inverted box would drive bigminAtLeast into its "impossible"
    // 0,1,0 bit state (IllegalStateException) instead of returning no
    // buckets — fail loudly at the API edge instead (ADVICE r12)
    require(aLo <= aHi && bLo <= bHi,
      s"inverted box: a=[$aLo,$aHi] b=[$bLo,$bHi]")
    val out = Seq.newBuilder[Long]
    val zEnd = interleave(aHi, bHi)
    var z = interleave(aLo, bLo)
    var go = true
    while (go) {
      val m = bigminAtLeast(z, aLo, aHi, bLo, bHi)
      if (m < 0) go = false
      else {
        val bucket = m >>> shift
        out += bucket
        val next = (bucket + 1) << shift
        if (next > zEnd) go = false else z = next
      }
    }
    out.result()
  }
}
