package graft.functions

/** Bitcoin-alphabet Base58 codec (public algorithm).
  *
  * Capability parity with the reference's `bs58` usage:
  * `/root/reference/src/lib/utils.rs:3-5` (encode) and
  * `/root/reference/src/lib/waves.rs:75-77` (validation). Implemented from the
  * public Base58 spec — repeated big-integer division over the 58-symbol
  * alphabet with leading-zero preservation.
  */
object Base58 {
  final val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  private val Indexes: Array[Int] = {
    val a = Array.fill(128)(-1)
    var i = 0
    while (i < Alphabet.length) { a(Alphabet.charAt(i).toInt) = i; i += 1 }
    a
  }

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    // Count leading zero bytes — each maps to a leading '1'.
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    // Base-256 → base-58 by repeated division.
    val digits = java.util.Arrays.copyOf(input, input.length)
    val out = new StringBuilder
    var start = zeros
    while (start < digits.length) {
      // One division step of the big integer `digits` by 58; remainder is the next symbol.
      var remainder = 0
      var i = start
      while (i < digits.length) {
        val num = (digits(i) & 0xff) + remainder * 256
        digits(i) = (num / 58).toByte
        remainder = num % 58
        i += 1
      }
      out.append(Alphabet.charAt(remainder))
      if (digits(start) == 0) start += 1
    }
    var z = 0
    while (z < zeros) { out.append('1'); z += 1 }
    out.reverseInPlace().toString
  }

  def decode(s: String): Option[Array[Byte]] = {
    if (s.isEmpty) return Some(Array.emptyByteArray)
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    val digits = new Array[Int](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val v = if (c < 128) Indexes(c.toInt) else -1
      if (v < 0) return None
      digits(i) = v
      i += 1
    }
    // base-58 → base-256 by repeated multiplication-addition.
    val decoded = new Array[Byte](s.length)
    var outLen = 0
    i = zeros
    while (i < s.length) {
      var carry = digits(i)
      var j = 0
      while (j < outLen || carry != 0) {
        val idx = decoded.length - 1 - j
        val num = carry + (if (j < outLen) (decoded(idx) & 0xff) * 58 else 0)
        decoded(idx) = (num & 0xff).toByte
        carry = num >> 8
        j += 1
      }
      outLen = j
      i += 1
    }
    val res = new Array[Byte](zeros + outLen)
    System.arraycopy(decoded, decoded.length - outLen, res, zeros, outLen)
    Some(res)
  }

  /** Mirror of `is_valid_base58` (`waves.rs:75-77`): decodable ⇒ valid. */
  def isValid(s: String): Boolean = decode(s).isDefined
}
