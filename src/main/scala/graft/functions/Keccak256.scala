package graft.functions

/** Keccak-256 — the original Keccak submission padding (0x01), NOT SHA3-256
  * (0x06). This is the variant used by Ethereum and Waves.
  *
  * Capability parity with the reference's `sha3::Keccak256`
  * (`/root/reference/src/lib/waves.rs:15-21`). Implemented from the public
  * Keccak specification: Keccak-f[1600], rate 1088 bits / capacity 512.
  */
object Keccak256 {
  private val RoundConstants: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // Rotation offsets in lane order index = x + 5*y.
  private val RotationOffsets: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private val RateBytes = 136 // (1600 - 512) / 8

  def hash(message: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    var offset = 0
    // Absorb full rate blocks.
    while (message.length - offset >= RateBytes) {
      absorb(state, message, offset, RateBytes)
      keccakF(state)
      offset += RateBytes
    }
    // Final block with multi-rate padding 0x01 … 0x80.
    val last = new Array[Byte](RateBytes)
    val rem = message.length - offset
    System.arraycopy(message, offset, last, 0, rem)
    last(rem) = 0x01
    last(RateBytes - 1) = (last(RateBytes - 1) | 0x80).toByte
    absorb(state, last, 0, RateBytes)
    keccakF(state)
    // Squeeze 32 bytes.
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def absorb(state: Array[Long], data: Array[Byte], offset: Int, len: Int): Unit = {
    var i = 0
    while (i < len / 8) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (data(offset + i * 8 + j) & 0xffL); j -= 1 }
      state(i) ^= w
      i += 1
    }
  }

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // θ
      var x = 0
      while (x < 5) { c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20); x += 1 }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // ρ and π
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          // B[y, 2x+3y] = rot(A[x,y], r[x,y])
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), RotationOffsets(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // χ
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // ι
      a(0) ^= RoundConstants(round)
      round += 1
    }
  }
}
