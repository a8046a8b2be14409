package graft

import graft.ops.Multimodal
import scala.util.Random

/** Round-7d pins: pHash against a naive (non-separable) driver DCT,
  * its perceptual robustness contract, and audioFeatures against a
  * driver brute force on random PCM. */
class Round7dSpec extends SparkSpec {

  private def mkBmp(key: Long, perturb: Option[(Int, Int)] = None): Array[Byte] = {
    val px = Array.tabulate(1024) { i =>
      val x = i % 32; val y = i / 32
      ((x * 7 + y * 13 + key * 31) % 256).toInt
    }
    perturb.foreach { case (idx, delta) =>
      px(idx) = math.max(0, math.min(255, px(idx) + delta))
    }
    Multimodal.makeBmp(32, 32, px)
  }

  private def hamming(a: Multimodal.PHashMeta, b: Multimodal.PHashMeta): Int =
    java.lang.Long.bitCount(a.hash_hi ^ b.hash_hi) +
      java.lang.Long.bitCount(a.hash_lo ^ b.hash_lo)

  test("pHash32 equals a naive non-separable integer DCT") {
    // independent path: direct 64×1024 accumulation over the PIXEL
    // FORMULA (no byte walk), lower-median rank threshold re-derived
    for (key <- Seq(1L, 7L, 42L)) {
      val gray = Array.tabulate(1024) { i =>
        val x = i % 32; val y = i / 32
        3L * ((x * 7 + y * 13 + key * 31) % 256)
      }
      val f = Array.tabulate(64) { uv =>
        val u = uv / 8; val v = uv % 8
        var acc = 0L
        for (y <- 0 until 32; x <- 0 until 32)
          acc += gray(y * 32 + x) * Multimodal.dctQ(u * 32 + x) *
            Multimodal.dctQ(v * 32 + y)
        acc
      }
      val med = f.sorted.apply(31)
      var hi = 0L; var lo = 0L; var n = 0L
      for (i <- 0 until 64 if f(i) > med) {
        n += 1
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      val got = Multimodal.pHash32(mkBmp(key))
      assert(got.valid)
      assert((got.hash_hi, got.hash_lo, got.n_set, got.dc) ==
        ((hi, lo, n, f(0))))
    }
  }

  test("pHash32 robustness: identical bytes agree, a small local edit flips few bits") {
    val base = Multimodal.pHash32(mkBmp(9L))
    assert(base.valid)
    assert(hamming(base, Multimodal.pHash32(mkBmp(9L))) == 0)
    // one pixel nudged ±8 gray: a local edit perturbs the DCT
    // coefficients by at most 8·3·1e8 each — far below typical
    // coefficient spread, so the hash moves a few bits at most
    for (idx <- Seq(0, 500, 1023)) {
      val d = hamming(base, Multimodal.pHash32(mkBmp(9L, Some((idx, 8)))))
      assert(d <= 8, s"pixel $idx moved $d bits")
    }
    // a DIFFERENT image is far away
    assert(hamming(base, Multimodal.pHash32(mkBmp(10L))) > 8)
  }

  test("pHash32 errors-as-data: corrupt and wrong-size input") {
    assert(!Multimodal.pHash32(Array[Byte](1, 2, 3)).valid)
    val sixteen = Multimodal.makeBmp(16, 16,
      Array.tabulate(256)(_ % 256))
    assert(!Multimodal.pHash32(sixteen).valid)
  }

  test("audioFeatures equals a driver brute force on random PCM") {
    val rnd = new Random(17L)
    val samples = Array.fill[Short](2048)(
      (rnd.nextInt(65536) - 32768).toShort)
    val got = Multimodal.audioFeatures(
      Multimodal.makeWav(16000, 1, samples))
    assert(got.valid)
    var zc = 0L; var sAbs = 0L; var sSq = 0L
    for (i <- samples.indices) {
      if (i > 0 && (samples(i) < 0) != (samples(i - 1) < 0)) zc += 1
      sAbs += math.abs(samples(i).toLong)
      sSq += samples(i).toLong * samples(i).toLong
    }
    assert((got.n_samples, got.n_zero_cross, got.sum_abs, got.sum_sq) ==
      ((2048L, zc, sAbs, sSq)))
  }

  test("audioFeatures errors-as-data: stereo and corrupt input") {
    val stereo = Multimodal.makeWav(16000, 2, Array[Short](1, -1, 2, -2))
    assert(!Multimodal.audioFeatures(stereo).valid)
    assert(!Multimodal.audioFeatures(Array[Byte](82, 73)).valid)
  }
}
