package graft.sources.pbf

import org.scalatest.funsuite.AnyFunSuite

class ProtoReaderSpec extends AnyFunSuite {

  private def varintBytes(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += (x & 0x7f).toByte
    out.toArray
  }

  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  test("varint round-trip on known values") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, Int.MaxValue.toLong, Long.MaxValue, -1L)) {
      val r = new ProtoReader(varintBytes(v))
      assert(r.readVarint() === v)
    }
  }

  test("varint round-trip property (seeded random)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val v = rnd.nextLong()
      assert(new ProtoReader(varintBytes(v)).readVarint() === v)
    }
  }

  test("zigzag round-trip property (delta-encode → decode = identity)") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 2000) {
      val v = rnd.nextLong() / 2
      assert(new ProtoReader(varintBytes(zigzagEncode(v))).readZigzag() === v)
    }
  }

  test("zigzag known values") {
    // protobuf spec examples: 0→0, -1→1, 1→2, -2→3
    assert(new ProtoReader(Array[Byte](0)).readZigzag() === 0L)
    assert(new ProtoReader(Array[Byte](1)).readZigzag() === -1L)
    assert(new ProtoReader(Array[Byte](2)).readZigzag() === 1L)
    assert(new ProtoReader(Array[Byte](3)).readZigzag() === -2L)
  }

  test("strict UTF-8 decode returns null on invalid bytes") {
    assert(ProtoReader.strictUtf8(Array[Byte](0x41, 0x42), 0, 2) === "AB")
    assert(ProtoReader.strictUtf8(Array[Byte](0xff.toByte, 0xfe.toByte), 0, 2) === null)
  }

  test("packed varint and message framing") {
    val payload = varintBytes(1) ++ varintBytes(128) ++ varintBytes(5)
    val framed = varintBytes(payload.length.toLong) ++ payload
    val r = new ProtoReader(framed)
    assert(r.readPackedVarint().toSeq === Seq(1L, 128L, 5L))
  }
}
