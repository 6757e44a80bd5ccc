package graft.convert

/** Minimal protobuf wire-format codec — the PUBLIC encoding spec
  * (protobuf.dev/programming-guides/encoding): little-endian base-128
  * varints, `(field << 3 | wireType)` tags, length-delimited submessages.
  * No generated code and no external dependency, which is what the zero-
  * egress build requires; message SCHEMAS (field numbers) live with the
  * message decoders in [[UpdatesProto.Schema]].
  *
  * Only the three wire types the blockchain-updates feed uses are
  * implemented (varint, length-delimited, and skip-support for fixed32/64);
  * unknown fields are skipped, as the spec requires of a decoder.
  */
object ProtoWire {

  final val WtVarint = 0
  final val WtFixed64 = 1
  final val WtLen = 2
  final val WtFixed32 = 5

  /** Cursor over one message's bytes. `readTag` then dispatch on field
    * number; always consume (or [[skip]]) the field's value. */
  final class Reader private (val buf: Array[Byte], private var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)

    def has: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        if (pos >= end) throw new IllegalArgumentException(s"varint past end at $pos")
        if (shift >= 64) throw new IllegalArgumentException("varint longer than 10 bytes")
        b = buf(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }

    /** Returns `(field << 3) | wireType` — mask with 7 for the wire type,
      * shift right 3 for the field number. */
    def readTag(): Int = readVarint().toInt

    def readBool(): Boolean = readVarint() != 0L

    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(s"bad length $n at $pos")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }

    def readString(): String = new String(readBytes(), "UTF-8")

    /** Reader scoped to the next length-delimited value (a submessage). */
    def subMessage(): Reader = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(s"bad length $n at $pos")
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }

    def skip(wireType: Int): Unit = wireType match {
      case WtVarint => readVarint()
      case WtLen => val n = readVarint().toInt; pos += n
      case WtFixed64 => pos += 8
      case WtFixed32 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  /** Append-only message builder. Field writers omit default values
    * (0 / false / empty), matching proto3 serialization. */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()

    private def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    private def tag(field: Int, wireType: Int): Unit = varint((field.toLong << 3) | wireType)

    def int64(field: Int, v: Long): Writer = {
      if (v != 0L) { tag(field, WtVarint); varint(v) }
      this
    }

    /** proto int32: negatives sign-extend to 10 varint bytes. */
    def int32(field: Int, v: Int): Writer = int64(field, v.toLong)

    def bool(field: Int, v: Boolean): Writer = {
      if (v) { tag(field, WtVarint); varint(1) }
      this
    }

    def bytes(field: Int, b: Array[Byte]): Writer = {
      if (b.nonEmpty) bytesAlways(field, b)
      this
    }

    /** Writes even when empty — for repeated-field slots where an empty
      * element must keep its position (parallel-array zips). */
    def bytesAlways(field: Int, b: Array[Byte]): Writer = {
      tag(field, WtLen)
      varint(b.length.toLong)
      out.write(b, 0, b.length)
      this
    }

    def string(field: Int, s: String): Writer = bytes(field, s.getBytes("UTF-8"))

    def message(field: Int)(f: Writer => Unit): Writer = {
      val w = new Writer
      f(w)
      bytesAlways(field, w.toBytes)
    }

    def toBytes: Array[Byte] = out.toByteArray
  }
}
