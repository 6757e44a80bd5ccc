package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Base58, Blake2b256, Keccak256, Waves}

class FunctionsSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  private val rnd = new scala.util.Random(42) // deterministic "property" inputs
  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  // ---- Base58 (vectors + round-trip) ----

  test("base58 encodes known vectors") {
    assert(Base58.encode("hello".getBytes(UTF_8)) == "Cn8eVZg")
    assert(Base58.encode(Array[Byte](0, 0xff.toByte)) == "15Q")
    assert(Base58.encode("Waves test vector 123".getBytes(UTF_8)) == "6NeN8CgExwoAH5ZqG2KGoWZWNw7zJ")
    assert(Base58.encode(Array.emptyByteArray) == "")
  }

  test("base58 validation matches the reference's own cases (waves.rs:91-107)") {
    assert(Base58.isValid("3PC9BfRwJWWiw9AREE2B3eWzCks3CYtg4yo"))
    assert(!Base58.isValid("not-valid-string"))
  }

  test("base58 round-trips arbitrary byte arrays") {
    for (len <- Seq(0, 1, 2, 3, 7, 20, 26, 32, 64, 200); _ <- 1 to 20) {
      val bytes = randomBytes(len)
      assert(Base58.decode(Base58.encode(bytes)).map(_.toSeq).contains(bytes.toSeq),
        s"round-trip failed for ${hex(bytes)}")
    }
    // leading zeros preserved
    val z = Array[Byte](0, 0, 5, 9)
    assert(Base58.decode(Base58.encode(z)).map(_.toSeq).contains(z.toSeq))
  }

  // ---- Digests (public known-answer vectors) ----

  test("blake2b256 known vectors") {
    assert(hex(Blake2b256.hash(Array.emptyByteArray)) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(hex(Blake2b256.hash("abc".getBytes(UTF_8))) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(hex(Blake2b256.hash("The quick brown fox jumps over the lazy dog".getBytes(UTF_8))) ==
      "01718cec35cd3d796dd00020e0bfecb473ad23457d063b75eff29c0ffa2e58a9")
  }

  test("blake2b256 handles exact block-boundary lengths") {
    for (len <- Seq(127, 128, 129, 255, 256, 257, 1000)) {
      val m = Array.tabulate[Byte](len)(i => (i % 251).toByte)
      assert(Blake2b256.hash(m).length == 32)
      assert(hex(Blake2b256.hash(m)) == hex(Blake2b256.hash(m.clone())))
    }
  }

  test("keccak256 known vectors (Ethereum/Waves variant, 0x01 padding)") {
    assert(hex(Keccak256.hash(Array.emptyByteArray)) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex(Keccak256.hash("abc".getBytes(UTF_8))) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("keccak256 handles rate-boundary lengths (136-byte blocks)") {
    for (len <- Seq(135, 136, 137, 272, 500)) {
      val m = Array.tabulate[Byte](len)(i => (i % 17).toByte)
      assert(Keccak256.hash(m).length == 32)
      assert(hex(Keccak256.hash(m)) == hex(Keccak256.hash(m.clone())))
    }
  }

  // ---- Waves address derivation (waves.rs:35-73) ----

  test("address derivation is structurally valid and deterministic") {
    for (len <- Seq(0, 16, 32, 64); _ <- 1 to 10) {
      val pk = randomBytes(len)
      val addr = Waves.addressFromPublicKey(pk, 'W'.toByte)
      assert(Waves.isValidAddress(addr, Some('W'.toByte)))
      assert(addr == Waves.addressFromPublicKey(pk, 'W'.toByte))
      // checksum breaks under chain-id substitution
      assert(!Waves.isValidAddress(addr, Some('T'.toByte)))
    }
  }

  test("address bytes layout: version 1, chain id, 26 bytes") {
    val addr = Waves.addressFromPublicKey(new Array[Byte](32), 'W'.toByte)
    val bytes = Base58.decode(addr).get
    assert(bytes.length == 26)
    assert(bytes(0) == 1)
    assert(bytes(1) == 'W'.toByte)
  }

  test("addressFromPublicKeyHash matches addressFromPublicKey's tail") {
    val pk = randomBytes(32)
    val pkh = java.util.Arrays.copyOfRange(Waves.secureHash(pk), 0, 20)
    assert(Waves.addressFromPublicKeyHash(pkh, 'W'.toByte) == Waves.addressFromPublicKey(pk, 'W'.toByte))
  }

  // ---- misc helpers ----

  test("extract_asset_id: empty => WAVES sentinel (waves.rs:79-85)") {
    assert(Waves.extractAssetId(Array.emptyByteArray) == "WAVES")
    assert(Waves.extractAssetId(null) == "WAVES")
    assert(Waves.extractAssetId("hello".getBytes(UTF_8)) == "Cn8eVZg")
  }

  test("prefixed base64: empty => empty string (utils.rs:7-15)") {
    assert(Waves.prefixedBase64(Array.emptyByteArray) == "")
    assert(Waves.prefixedBase64(Array[Byte](0, 1)) == "base64:AAE=")
  }

  test("escape_unicode_null (utils.rs:22-24)") {
    assert(Waves.escapeUnicodeNull("a" + "\u0000" + "b") == "a\\0b")
    assert(Waves.escapeUnicodeNull("plain") == "plain")
  }

  test("prefixed hex (models.rs:180-182)") {
    assert(Waves.prefixedHex(Array[Byte](0x0a, 0xff.toByte)) == "0x0aff")
  }

  test("ticker key parse (mod.rs:548-581)") {
    assert(Waves.parseTickerKey("%s%s__assetId2ticker__abcDEF123").contains("abcDEF123"))
    assert(Waves.parseTickerKey("unrelated_key").isEmpty)
  }
}
