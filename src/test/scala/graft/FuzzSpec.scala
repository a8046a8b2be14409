package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Randomized byte-mutation fuzz over every binary parser (r9 verdict
  * #6): the WAV/PNG/BMP/JPEG/MP4 walks handle SYNTHESIZED truncations
  * in their unit specs, but crawl bytes are adversarial — this pins
  * the errors-as-data contract (`never throw; corrupt input is a
  * valid=false ROW`) under seeded random mutation: bit flips, byte
  * overwrites, truncations, duplications, and pure-noise inputs, 150+
  * mutants per format. No Spark session needed — the parsers are pure
  * byte math, which is exactly why they can make this promise.
  */
class FuzzSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  private def mutants(base: Array[Byte], n: Int): Iterator[Array[Byte]] = {
    def clamp(i: Int, lo: Int, hi: Int) = math.max(lo, math.min(i, hi))
    Iterator.tabulate(n) { i =>
      val b = base.clone()
      i % 5 match {
        case 0 => // flip 1-8 random bits
          (0 to rng.nextInt(8)).foreach { _ =>
            val p = rng.nextInt(b.length)
            b(p) = (b(p) ^ (1 << rng.nextInt(8))).toByte
          }
          b
        case 1 => // overwrite a random span with random bytes
          val from = rng.nextInt(b.length)
          val len = clamp(rng.nextInt(16) + 1, 1, b.length - from)
          (0 until len).foreach(j => b(from + j) = rng.nextInt(256).toByte)
          b
        case 2 => // truncate at a random offset (including 0)
          b.take(rng.nextInt(b.length + 1))
        case 3 => // duplicate a random span onto the tail
          val from = rng.nextInt(b.length)
          val len = clamp(rng.nextInt(32) + 1, 1, b.length - from)
          b ++ b.slice(from, from + len)
        case _ => // hostile length fields: max out a random 4-byte span
          val from = rng.nextInt(math.max(b.length - 4, 1))
          (0 until math.min(4, b.length - from)).foreach { j =>
            b(from + j) = (if (j % 2 == 0) 0xff else 0x7f).toByte
          }
          b
      }
    } ++ Iterator.tabulate(30) { _ => // pure noise, assorted sizes
      val len = rng.nextInt(256)
      val b = new Array[Byte](len); rng.nextBytes(b); b
    } ++ Iterator(Array.emptyByteArray, null)
  }

  private def assertTotal[A](name: String, base: Array[Byte],
                             parse: Array[Byte] => A): Unit = {
    var i = 0
    mutants(base, 150).foreach { m =>
      try { parse(m); () }
      catch {
        case e: Throwable =>
          fail(s"$name threw on mutant #$i (len=${if (m == null) -1 else m.length}): $e")
      }
      i += 1
    }
    assert(i >= 150, s"$name: only $i mutants exercised")
  }

  test("parseWavHeader never throws on mutated bytes") {
    val base = Multimodal.makeWav(16000, 2, Array.tabulate[Short](512)(_.toShort))
    assertTotal("parseWavHeader", base, Multimodal.parseWavHeader)
  }

  test("parseImageHeader (PNG) never throws on mutated bytes") {
    assertTotal("parseImageHeader/png", Multimodal.makePngHeader(640, 480),
      Multimodal.parseImageHeader)
  }

  test("parseImageHeader (BMP) never throws on mutated bytes") {
    val base = Multimodal.makeBmp(16, 16, Array.fill(256)(0x336699))
    assertTotal("parseImageHeader/bmp", base, Multimodal.parseImageHeader)
  }

  test("parseImageHeader (JPEG) never throws on mutated bytes") {
    assertTotal("parseImageHeader/jpeg", Multimodal.makeJpegHeader(1024, 768),
      Multimodal.parseImageHeader)
  }

  test("parseMp4Boxes never throws on mutated bytes") {
    val base = Multimodal.makeMp4Boxes(96, 2048, withLargesize = true)
    assertTotal("parseMp4Boxes", base, Multimodal.parseMp4Boxes)
  }

  test("tarWalkBytes never throws on mutated bytes") {
    val base = Multimodal.makeTar(Seq(
      ("a.txt", Array.tabulate[Byte](37)(_.toByte)),
      ("b.bin", Array.tabulate[Byte](700)(i => (i % 120).toByte)),
      ("c.cls", Array[Byte](1))))
    assertTotal("tarWalkBytes", base, Multimodal.tarWalkBytes)
  }

  test("tar round-trip and named corruption errors") {
    val entries = Seq(
      ("0.txt", Array.tabulate[Byte](9)(_.toByte)),
      ("0.cls", Array[Byte](5)),
      ("0.bin", Array.tabulate[Byte](513)(i => (i % 7).toByte)))
    val tar = Multimodal.makeTar(entries)
    val w = Multimodal.tarWalkBytes(tar)
    assert(w.valid && w.err == "" && w.n_entries == 3)
    assert(w.entries.map(e => (e.name, e.size)) ==
      entries.map(e => (e._1, e._2.length.toLong)))
    // checksum corruption at the FIRST header: named error, no entries
    val bad = tar.clone(); bad(0) = (bad(0) ^ 0x01).toByte
    val wb = Multimodal.tarWalkBytes(bad)
    assert(!wb.valid && wb.err == "bad_checksum" && wb.n_entries == 0)
    // truncation mid-third-entry's CONTENT (header intact): the walk
    // lists the header, then names the fault
    val wt = Multimodal.tarWalkBytes(tar.take(2048 + 512 + 100))
    assert(!wt.valid && wt.err == "truncated" && wt.n_entries == 3,
      s"got ${wt.err}/${wt.n_entries}")
    // truncation mid-header: the walk cannot even list it
    val wh = Multimodal.tarWalkBytes(tar.take(512 + 512 + 100))
    assert(!wh.valid && wh.err == "no_terminator" && wh.n_entries == 1,
      s"got ${wh.err}/${wh.n_entries}")
    // missing terminator blocks
    val wnt = Multimodal.tarWalkBytes(tar.dropRight(1024))
    assert(!wnt.valid && wnt.err == "no_terminator" && wnt.n_entries == 3)
  }

  test("cross-format confusion: every parser accepts every OTHER format's bytes as data") {
    val inputs = Seq(
      Multimodal.makeWav(8000, 1, Array.fill[Short](64)(7)),
      Multimodal.makePngHeader(8, 8),
      Multimodal.makeBmp(8, 8, Array.fill(64)(1)),
      Multimodal.makeJpegHeader(32, 32),
      Multimodal.makeMp4Boxes(8, 8))
    inputs.foreach { b =>
      Multimodal.parseWavHeader(b)
      Multimodal.parseImageHeader(b)
      Multimodal.parseMp4Boxes(b)
      Multimodal.tarWalkBytes(b)
    }
  }
}
