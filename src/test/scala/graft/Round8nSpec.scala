package graft

import graft.ops.Multimodal

/** JPEG marker-walk parser laws: synthesize→parse roundtrip,
  * errors-as-data on truncation and garbage, and segment skipping
  * (the SOF must be found BEHIND the APP0 segment, proving the
  * length-walk, not a fixed offset).
  */
class Round8nSpec extends SparkSpec {

  test("JPEG header: roundtrip, truncation, garbage") {
    for ((w, h) <- Seq((16, 16), (640, 480), (65535, 1))) {
      val m = Multimodal.parseImageHeader(Multimodal.makeJpegHeader(w, h))
      assert(m.format === "jpeg" && m.valid)
      assert(m.width === w && m.height === h && m.bit_depth === 8)
    }
    // truncated: SOI survives, SOF never reached -> jpeg but invalid
    val t = Multimodal.parseImageHeader(
      Multimodal.makeJpegHeader(100, 50).take(9))
    assert(t.format === "jpeg" && !t.valid)
    // garbage and wrong-signature bytes are not jpeg
    assert(!Multimodal.parseImageHeader(Array[Byte](1, 2, 3, 4)).valid)
    val g = Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0x00, 0x01).map(_.toByte))
    assert(g.format === "jpeg" && !g.valid)
  }

  test("JPEG walk skips unknown segments to find SOF") {
    // hand-build: SOI + COM segment (len 4) + SOF0 — the parser must
    // hop over COM by its declared length
    val bb = java.nio.ByteBuffer.allocate(2 + 6 + 13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xfe.toByte).putShort(4).putShort(0) // COM
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(11)
    bb.put(8.toByte).putShort(77).putShort(33)
    bb.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    val m = Multimodal.parseImageHeader(bb.array())
    assert(m.valid && m.width === 33 && m.height === 77)
  }

  test("JPEG walk tolerates 0xFF fill bytes and every SOF variant") {
    // spec-legal padding: any number of 0xFF fill bytes may precede a
    // marker; SOF2 (progressive) and the other frame variants carry
    // the same precision/height/width prefix as SOF0
    def img(sof: Int, fill: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(2 + 6 + fill + 13)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.put(0xff.toByte).put(0xd8.toByte)
      bb.put(0xff.toByte).put(0xfe.toByte).putShort(4).putShort(0) // COM
      (1 to fill).foreach(_ => bb.put(0xff.toByte))
      bb.put(0xff.toByte).put(sof.toByte).putShort(11)
      bb.put(8.toByte).putShort(240).putShort(320)
      bb.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
      bb.array()
    }
    for (sof <- Seq(0xc0, 0xc1, 0xc2, 0xc3, 0xc5, 0xc6, 0xc7,
        0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf); fill <- Seq(0, 1, 3)) {
      val m = Multimodal.parseImageHeader(img(sof, fill))
      assert(m.valid && m.width === 320 && m.height === 240,
        s"sof=$sof fill=$fill -> $m")
    }
    // DHT (0xC4) is NOT a frame header: same shape must stay invalid
    // (the walk skips it by length and runs off the end)
    assert(!Multimodal.parseImageHeader(img(0xc4, 0)).valid)
    // a standalone RST marker (no length field) must not desync the walk
    val bb = java.nio.ByteBuffer.allocate(2 + 2 + 13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xd0.toByte) // RST0, standalone
    bb.put(0xff.toByte).put(0xc2.toByte).putShort(11)
    bb.put(8.toByte).putShort(9).putShort(7)
    bb.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    val r = Multimodal.parseImageHeader(bb.array())
    assert(r.valid && r.width === 7 && r.height === 9)
  }
}
