package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column operators.
  *
  * Model follows the reference's own scale choice (SURVEY §1.1): a
  * record carries a PATH REFERENCE (`binary_path`) by default; bytes
  * are inlined as a `binary` column only for small clips via the
  * `binaryFile` source. At 100 TB the path-reference table shuffles
  * like any other table while blobs stay put on object storage.
  *
  * Real here: the RIFF/WAV header parser (pure JVM byte math), the
  * binaryFile plumbing, the subprocess pipe operator (exercised with
  * real processes in tests). Stubbed (deterministic fakes, clearly
  * marked): the actual media decode — codec libraries are not in this
  * build environment.
  */
object Multimodal {

  /** `binaryFile` scan: (path, modificationTime, length, content).
    * `pathGlobFilter` prunes at listing time — no bytes read for
    * filtered-out files. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*.wav"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  case class WavMeta(
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_samples: Long, duration_sec: Double, valid: Boolean)

  /** Parse a RIFF/WAVE header (PCM). Pure byte math — no codec. */
  def parseWavHeader(bytes: Array[Byte]): WavMeta = {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(bytes.slice(o, o + 4), "US-ASCII")
    if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return WavMeta(0, 0, 0, 0L, 0.0, valid = false)
    // walk chunks to find fmt and data (fmt is not always at 12).
    // Corrupt input is data, not an exception (errors-as-data): sizes
    // are validated so hostile chunk lengths can't loop or index OOB.
    var off = 12L
    var sr = 0; var ch = 0; var bits = 0; var dataLen = 0L
    var ok = true
    while (ok && off + 8 <= bytes.length) {
      val id = tag(off.toInt); val sz = le32(off.toInt + 4)
      if (sz < 0 || off + 8 + sz > Int.MaxValue.toLong) ok = false
      else {
        if (id == "fmt ") {
          if (off + 24 <= bytes.length) {
            ch = le16(off.toInt + 10); sr = le32(off.toInt + 12).toInt
            bits = le16(off.toInt + 22)
          } else ok = false
        } else if (id == "data") {
          dataLen = sz
        }
        off += 8 + sz + (sz & 1)
      }
    }
    // bits < 8 (e.g. 4-bit ADPCM or a hostile bits=1) would make the
    // frame divisor 0 — corrupt input stays data, never an exception.
    val bytesPerFrame = ch * bits / 8
    if (sr <= 0 || ch <= 0 || bits <= 0 || bytesPerFrame <= 0)
      WavMeta(0, 0, 0, 0L, 0.0, valid = false)
    else {
      val n = dataLen / bytesPerFrame
      WavMeta(sr, ch, bits, n, n.toDouble / sr, valid = true)
    }
  }

  /** Typed metadata column from a binary WAV column — a native
    * codegen expression (functions/MultimodalExpressions), not a
    * UDF: the WAV lanes run it once per row, and the expression form
    * keeps the plan inside whole-stage codegen with no encoder
    * round-trip. */
  def wavMetadata(content: Column): Column =
    org.apache.spark.sql.graftglue.GraftPlanApi.column(
      graft.functions.WavMetadataExpr(
        org.apache.spark.sql.graftglue.GraftPlanApi.expression(content)))

  /** Locate the PCM `data` chunk: (offset-of-first-sample-byte, len).
    * Same guarded chunk walk as parseWavHeader. (-1, 0) when absent. */
  private def findDataChunk(bytes: Array[Byte]): (Int, Long) = {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes.slice(o, o + 4), "US-ASCII")
    var off = 12L
    while (off + 8 <= bytes.length) {
      val id = tag(off.toInt); val sz = le32(off.toInt + 4)
      if (sz < 0 || off + 8 + sz > Int.MaxValue.toLong) return (-1, 0L)
      if (id == "data") return (off.toInt + 8, sz)
      off += 8 + sz + (sz & 1)
    }
    (-1, 0L)
  }

  case class VadMeta(n_windows: Long, n_active: Long, n_segments: Long,
                     active_ppm: Long, valid: Boolean)

  /** Energy-based voice-activity segmentation over 16-bit mono PCM WAV
    * bytes (the reference's Vosk chunk loop decides "speech vs
    * silence" this way before ASR; inputs/system_audio_collector.py:
    * 39-53 reads fixed-size chunks and lets the recognizer gate them).
    * Per fixed window of `windowFrames` samples: sum of |sample|
    * (integer — no float accumulation), active iff the sum clears
    * `threshold`; adjacent active windows merge into segments. The
    * trailing partial window counts as a window. Returns window/
    * segment counts plus the active share in ppm — the speech-density
    * signal an audio-curation pipeline filters on (keep clips with
    * enough speech, drop dead air).
    *
    * Byte-level work is inherent here, so a per-row UDF is the
    * documented norm (q65/q134/q135); corrupt input is data
    * (valid = false), never a task exception. */
  def energyVad(bytes: Array[Byte], windowFrames: Int,
                threshold: Long): VadMeta = {
    val meta = parseWavHeader(bytes)
    if (!meta.valid || meta.bits_per_sample != 16 || meta.channels != 1 ||
        windowFrames <= 0)
      return VadMeta(0L, 0L, 0L, 0L, valid = false)
    val (dataOff, dataLen) = findDataChunk(bytes)
    if (dataOff < 0) return VadMeta(0L, 0L, 0L, 0L, valid = false)
    val n = math.min(dataLen / 2,
      ((bytes.length - dataOff) / 2).toLong).toInt
    var i = 0; var winSum = 0L; var inWin = 0
    var nWin = 0L; var nActive = 0L; var nSeg = 0L; var prevActive = false
    def closeWindow(): Unit = {
      nWin += 1
      val active = winSum > threshold
      if (active) { nActive += 1; if (!prevActive) nSeg += 1 }
      prevActive = active
      winSum = 0L; inWin = 0
    }
    while (i < n) {
      val s = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      winSum += math.abs(s.toLong)
      inWin += 1
      if (inWin == windowFrames) closeWindow()
      i += 1
    }
    if (inWin > 0) closeWindow()
    val ppm = if (nWin == 0) 0L else nActive * 1000000L / nWin
    VadMeta(nWin, nActive, nSeg, ppm, valid = true)
  }

  private val energyVadUdf = udf(energyVad _)

  /** VAD segmentation column from a binary WAV column. */
  def vadSegments(content: Column, windowFrames: Int,
                  threshold: Long): Column =
    energyVadUdf(content, lit(windowFrames), lit(threshold))

  case class AudioFeatMeta(n_samples: Long, n_zero_cross: Long,
                           sum_abs: Long, sum_sq: Long, valid: Boolean)

  /** One-pass integer audio features over 16-bit mono PCM WAV bytes —
    * the classic cheap speech/music/noise discriminators next to the
    * energy VAD: zero-crossing count (sign flips under the pinned
    * "non-negative vs negative" convention — high for fricatives and
    * hiss, low for voiced speech and tones), Σ|sample| (the VAD's
    * energy numerator), and Σ sample² (the RMS numerator, kept as the
    * exact integer sum — callers divide/sqrt at the edge, never
    * inside the engine where float folds would break bit-replay).
    * Everything exact: max Σs² = n·32768² stays in Long to n ≈ 8.6e9
    * frames per clip. Same errors-as-data contract as [[energyVad]]. */
  def audioFeatures(bytes: Array[Byte]): AudioFeatMeta = {
    val meta = parseWavHeader(bytes)
    if (!meta.valid || meta.bits_per_sample != 16 || meta.channels != 1)
      return AudioFeatMeta(0L, 0L, 0L, 0L, valid = false)
    val (dataOff, dataLen) = findDataChunk(bytes)
    if (dataOff < 0) return AudioFeatMeta(0L, 0L, 0L, 0L, valid = false)
    val n = math.min(dataLen / 2,
      ((bytes.length - dataOff) / 2).toLong).toInt
    var i = 0; var zc = 0L; var sAbs = 0L; var sSq = 0L
    var prevNeg = false
    while (i < n) {
      val s = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      sAbs += math.abs(s.toLong)
      sSq += s.toLong * s.toLong
      i += 1
    }
    AudioFeatMeta(n.toLong, zc, sAbs, sSq, valid = true)
  }

  private val audioFeaturesUdf = udf(audioFeatures _)

  /** Audio feature column (ZCR + exact energy sums) from a binary WAV
    * column. */
  def audioFeatureCols(content: Column): Column = audioFeaturesUdf(content)

  // -------------------------------------------------------------------
  // Image headers — same errors-as-data contract as WAV: corrupt or
  // unknown bytes yield valid=false, never an exception in the task.
  // Real byte-level parsing (PNG IHDR, BMP BITMAPINFOHEADER); only
  // pixel DECODING is stubbed (no image libs in this environment).
  // -------------------------------------------------------------------
  case class ImageMeta(format: String, width: Int, height: Int,
                       bit_depth: Int, valid: Boolean)

  def parseImageHeader(bytes: Array[Byte]): ImageMeta = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes == null) ImageMeta("", 0, 0, 0, valid = false)
    else if (bytes.length >= 33 && bytes.take(8).sameElements(pngSig) &&
      new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
      val w = be32(16); val h = be32(20); val depth = bytes(24) & 0xff
      // IHDR caps dims at 2^31-1; reject zero/overflow as corrupt
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        ImageMeta("png", 0, 0, 0, valid = false)
      else ImageMeta("png", w.toInt, h.toInt, depth, valid = true)
    } else if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M') {
      val w = le32(18); val h = le32(22)
      val depth = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
      // height may be negative (top-down rows); magnitude is the size
      val habs = math.abs(h.toInt)
      if (w <= 0 || w > Int.MaxValue || habs == 0)
        ImageMeta("bmp", 0, 0, 0, valid = false)
      else ImageMeta("bmp", w.toInt, habs, depth, valid = true)
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8) {
      // JPEG: walk FF-marker segments (2-byte big-endian lengths that
      // INCLUDE the length field) until a SOF frame header gives
      // precision/height/width; SOS/EOI or a broken walk ends it.
      // Spec details real crawl bytes exercise: a marker may be
      // preceded by any number of 0xFF FILL bytes (skipped, not
      // treated as a zero-length segment); TEM/RSTn are standalone
      // (no length field); every SOF variant counts (0xC0-0xCF minus
      // DHT 0xC4, JPG 0xC8, DAC 0xCC — baseline, progressive,
      // lossless, arithmetic, differential alike carry the same
      // precision/height/width prefix).
      def be16(o: Int): Int =
        ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def isSof(m: Int): Boolean =
        m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      var o = 2
      var out = ImageMeta("jpeg", 0, 0, 0, valid = false)
      var done = false
      while (!done && o + 1 < bytes.length) {
        if ((bytes(o) & 0xff) != 0xff) done = true
        else {
          // collapse fill bytes: 0xFF 0xFF ... 0xFF <marker>
          var m = o + 1
          while (m < bytes.length && (bytes(m) & 0xff) == 0xff) m += 1
          if (m >= bytes.length) done = true
          else {
            val marker = bytes(m) & 0xff
            if (marker == 0xd9 || marker == 0xda) done = true
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
              o = m + 1 // standalone marker, no length field
            } else if (m + 2 >= bytes.length) done = true
            else {
              val len = be16(m + 1)
              if (len < 2 || m + 1 + len > bytes.length) done = true
              else if (isSof(marker) && len >= 9) {
                val depth = bytes(m + 3) & 0xff
                val h = be16(m + 4); val w = be16(m + 6)
                out = ImageMeta("jpeg", w, h, depth, valid = w > 0 && h > 0)
                done = true
              } else o = m + 1 + len
            }
          }
        }
      }
      out
    } else ImageMeta("", 0, 0, 0, valid = false)
  }

  private val imageMetaUdf = udf(parseImageHeader _)

  /** Typed metadata column from a binary image column (PNG/BMP). */
  def imageMetadata(content: Column): Column = imageMetaUdf(content)

  /** Synthesize a minimal valid PNG header (signature + IHDR) followed
    * by no pixel data — enough for header parsing tests/stub decode. */
  def makePngHeader(width: Int, height: Int, bitDepth: Int = 8): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(bitDepth.toByte).put(6.toByte) // RGBA
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
  }

  /** Synthesize a minimal structurally-valid JPEG header walk:
    * SOI → APP0/JFIF → SOF0 (precision 8, one component) → EOI. No
    * entropy-coded data — enough for the marker-walk parser, the same
    * header-only contract as [[makePngHeader]]. */
  def makeJpegHeader(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0 len 16
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.put(1.toByte).put(1.toByte) // version 1.1
    buf.put(0.toByte).putShort(1).putShort(1) // units, density
    buf.put(0.toByte).put(0.toByte) // thumbnail 0x0
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(11) // SOF0 len 11
    buf.put(8.toByte) // precision
    buf.putShort(height.toShort).putShort(width.toShort)
    buf.put(1.toByte) // one component
    buf.put(1.toByte).put(0x11.toByte).put(0.toByte)
    buf.put(0xff.toByte).put(0xd9.toByte) // EOI
    buf.array()
  }

  /** Synthesize an uncompressed 24-bpp grayscale BMP (r=g=b) from a
    * row-major TOP-DOWN pixel array (values 0-255). Rows are written
    * bottom-up with 4-byte padding — the standard positive-height BMP
    * layout — so `averageHash` exercises the real flip + stride walk.
    * BMP is the one mainstream raster format with no compression
    * stage, which keeps the pixel path byte-exact without codec
    * libraries (the PNG lane, q134, stays header+payload-hash only). */
  def makeBmp(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height, "pixels != width*height")
    val stride = (width * 3 + 3) / 4 * 4
    val dataLen = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)            // reserved, pixel offset
      .putInt(40).putInt(width).putInt(height)       // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, no palette
    var r = height - 1
    while (r >= 0) {                                 // bottom-up rows
      var c = 0
      while (c < width) {
        val v = (pixels(r * width + c) & 0xff).toByte
        buf.put(v).put(v).put(v)                     // B G R
        c += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      r -= 1
    }
    buf.array()
  }

  case class AHashMeta(hash_hi: Long, hash_lo: Long, n_set: Long,
                       valid: Boolean)

  /** Perceptual average-hash over 24-bpp BMP bytes: the image is
    * block-averaged to an 8×8 grid (width/height must be multiples of
    * 8 — equal-sized blocks keep the math integer: bit_i set iff
    * 64·blocksum_i ≥ totalsum, the division-free form of "block mean
    * above global mean"), bits in row-major TOP-DOWN order, bit i of
    * `hash_lo` for i<32 and of `hash_hi` for i≥32 (both in [0,2³²) so
    * they survive any engine's signed 64-bit arithmetic). Gray is the
    * exact channel sum b+g+r (no luma division). Near-identical images
    * agree on most bits, so banding the 64 bits (the q44/q101 SimHash
    * discipline) gives image near-dup candidates without any decoder.
    * Corrupt/non-24bpp/odd-sized input is data (valid=false). */
  def averageHash(bytes: Array[Byte]): AHashMeta = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return AHashMeta(0L, 0L, 0L, valid = false)
    val pixOff = le32(10)
    val width = le32(18)
    val rawH = le32(22)
    val height = math.abs(rawH)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    if (bpp != 24 || width <= 0 || height == 0 ||
        width % 8 != 0 || height % 8 != 0)
      return AHashMeta(0L, 0L, 0L, valid = false)
    val stride = (width * 3 + 3) / 4 * 4
    if (pixOff < 0 || pixOff.toLong + stride.toLong * height > bytes.length)
      return AHashMeta(0L, 0L, 0L, valid = false)
    val bw = width / 8; val bh = height / 8
    val sums = new Array[Long](64)
    var total = 0L
    var row = 0
    while (row < height) {
      // positive height = bottom-up storage; normalize to top-down
      val srcRow = if (rawH > 0) height - 1 - row else row
      val base = pixOff + srcRow * stride
      var col = 0
      while (col < width) {
        val o = base + col * 3
        val gray = (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
          (bytes(o + 2) & 0xff)
        sums((row / bh) * 8 + col / bw) += gray
        total += gray
        col += 1
      }
      row += 1
    }
    var hi = 0L; var lo = 0L; var nSet = 0L; var i = 0
    while (i < 64) {
      if (64L * sums(i) >= total) {
        nSet += 1
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    AHashMeta(hi, lo, nSet, valid = true)
  }

  private val aHashUdf = udf(averageHash _)

  /** Average-hash column from a binary BMP column. */
  def imageAHash(content: Column): Column = aHashUdf(content)

  /** Fixed-point DCT-II basis for [[pHash32]]: dctQ(u*32 + x) =
    * round(cos(π·(2x+1)·u / 64) · 10⁴) for u ∈ [0,8), x ∈ [0,32),
    * from StrictMath (bit-reproducible across JVMs). Public so the
    * oracle SQL embeds the SAME table as literals — the transform is
    * then pure integer arithmetic in both engines. */
  val dctQ: Array[Long] = Array.tabulate(8 * 32) { i =>
    val u = i / 32; val x = i % 32
    math.round(StrictMath.cos(math.Pi * (2 * x + 1) * u / 64.0) * 10000.0)
  }

  case class PHashMeta(hash_hi: Long, hash_lo: Long, n_set: Long,
                       dc: Long, valid: Boolean)

  /** Perceptual DCT hash (pHash) over a 32×32 24-bpp grayscale BMP —
    * the frequency-domain near-dup fingerprint one level stronger than
    * [[averageHash]]: small local edits perturb a few DCT coefficients
    * instead of whole blocks, so re-encodes and touch-ups keep most
    * bits. The 2-D DCT-II restricted to the 8×8 low-frequency block is
    * computed ENTIRELY in integers via the quantized basis [[dctQ]]:
    * F(u,v) = Σ_{x,y} gray(x,y)·cq(u,x)·cq(v,y) (gray = exact b+g+r
    * sum; |F| ≤ 765·10⁸·1024 ≈ 7.8e13, well inside Long), bit(u,v) set
    * iff F exceeds the LOWER MEDIAN (32nd-smallest) of the 64 values —
    * a rank threshold, so the dropped 1/√N normalization constants
    * cannot change any bit. DC is included under the same threshold
    * (documented deviation from implementations that special-case it;
    * the rank threshold keeps ~half the bits set either way). Bit
    * i = u·8+v packs lo/hi exactly like [[averageHash]]. Input must be
    * exactly 32×32 (pHash downsamples first at the edge; a wrong-size
    * frame is data, valid=false, never an exception). */
  def pHash32(bytes: Array[Byte]): PHashMeta = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return PHashMeta(0L, 0L, 0L, 0L, valid = false)
    val pixOff = le32(10)
    val width = le32(18)
    val rawH = le32(22)
    val height = math.abs(rawH)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    if (bpp != 24 || width != 32 || height != 32)
      return PHashMeta(0L, 0L, 0L, 0L, valid = false)
    val stride = (width * 3 + 3) / 4 * 4
    if (pixOff < 0 || pixOff.toLong + stride.toLong * height > bytes.length)
      return PHashMeta(0L, 0L, 0L, 0L, valid = false)
    val gray = new Array[Long](32 * 32)
    var row = 0
    while (row < 32) {
      val srcRow = if (rawH > 0) 31 - row else row
      val base = pixOff + srcRow * stride
      var colI = 0
      while (colI < 32) {
        val o = base + colI * 3
        gray(row * 32 + colI) = (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
          (bytes(o + 2) & 0xff)
        colI += 1
      }
      row += 1
    }
    // separable DCT: rowPass(u, y) = Σ_x gray(x,y)·cq(u,x), then
    // F(u,v) = Σ_y rowPass(u, y)·cq(v,y) — 2·32·8 MACs per pixel row
    // instead of the naive 64·1024, same exact integer result
    val rowPass = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var acc = 0L; var x = 0
        while (x < 32) { acc += gray(y * 32 + x) * dctQ(u * 32 + x); x += 1 }
        rowPass(u * 32 + y) = acc
        y += 1
      }
      u += 1
    }
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L; var y = 0
        while (y < 32) { acc += rowPass(u * 32 + y) * dctQ(v * 32 + y); y += 1 }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val med = f.sorted.apply(31)
    var hi = 0L; var lo = 0L; var nSet = 0L; var i = 0
    while (i < 64) {
      if (f(i) > med) {
        nSet += 1
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    PHashMeta(hi, lo, nSet, f(0), valid = true)
  }

  private val pHashUdf = udf(pHash32 _)

  /** DCT perceptual-hash column from a binary 32×32 BMP column. */
  def imagePHash(content: Column): Column = pHashUdf(content)

  case class PatchStat(patch_id: Long, psum: Long, psumsq: Long)

  /** ViT-style patchify over a 32×32 24-bit BMP: the image splits
    * into 16 non-overlapping 8×8 patches (patch_id = (y div 8)·4 +
    * x div 8, row-major), each reduced to exact integer Σgray and
    * Σgray² (gray = r+g+b, 0..765 — the [[pHash32]] convention and
    * byte walk, bottom-up rows and stride padding included). The
    * per-patch stats are the schema a downstream patch-embedding
    * model consumes; means/variances derive exactly from the two
    * sums. Invalid/non-32×32 input returns an empty array —
    * errors-as-data, never an exception in the executor. */
  def patchStats32(bytes: Array[Byte]): Seq[PatchStat] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return Seq.empty
    val pixOff = le32(10)
    val width = le32(18)
    val rawH = le32(22)
    val height = math.abs(rawH)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    if (bpp != 24 || width != 32 || height != 32) return Seq.empty
    val stride = (width * 3 + 3) / 4 * 4
    if (pixOff < 0 || pixOff.toLong + stride.toLong * height > bytes.length)
      return Seq.empty
    val sums = new Array[Long](16)
    val sqs = new Array[Long](16)
    var row = 0
    while (row < 32) {
      val srcRow = if (rawH > 0) 31 - row else row
      val base = pixOff + srcRow * stride
      var colI = 0
      while (colI < 32) {
        val o = base + colI * 3
        val g = (bytes(o) & 0xff).toLong + (bytes(o + 1) & 0xff) +
          (bytes(o + 2) & 0xff)
        val p = (row / 8) * 4 + colI / 8
        sums(p) += g
        sqs(p) += g * g
        colI += 1
      }
      row += 1
    }
    (0 until 16).map(p => PatchStat(p.toLong, sums(p), sqs(p)))
  }

  /** Patch-stat array column from a binary 32×32 BMP column — native
    * codegen expression, same rationale as [[wavMetadata]]. */
  def imagePatchStats(content: Column): Column =
    org.apache.spark.sql.graftglue.GraftPlanApi.column(
      graft.functions.ImagePatchStatsExpr(
        org.apache.spark.sql.graftglue.GraftPlanApi.expression(content)))

  /** 64-bit energy-envelope fingerprint over 16-bit mono PCM WAV
    * bytes — the audio counterpart of [[averageHash]]: the clip is
    * cut into 64 equal windows (frame count must divide evenly),
    * window energy = Σ|sample| (integer), bit i set iff
    * 64·energy_i ≥ total (the same division-free mean threshold).
    * Re-encoded or slightly-edited copies of a clip keep most bits,
    * so [[Dedup.hammingNearDupPairs64]] over (hash_hi, hash_lo) gives
    * audio near-dup candidates with no codec anywhere. Corrupt,
    * non-mono, or non-divisible input is data (valid=false). */
  def audioFingerprint64(bytes: Array[Byte]): AHashMeta = {
    val meta = parseWavHeader(bytes)
    if (!meta.valid || meta.bits_per_sample != 16 || meta.channels != 1)
      return AHashMeta(0L, 0L, 0L, valid = false)
    val (dataOff, dataLen) = findDataChunk(bytes)
    if (dataOff < 0) return AHashMeta(0L, 0L, 0L, valid = false)
    val n = math.min(dataLen / 2, ((bytes.length - dataOff) / 2).toLong).toInt
    if (n == 0 || n % 64 != 0) return AHashMeta(0L, 0L, 0L, valid = false)
    val win = n / 64
    val sums = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      val a = math.abs(s.toLong)
      sums(i / win) += a
      total += a
      i += 1
    }
    var hi = 0L; var lo = 0L; var nSet = 0L
    var b = 0
    while (b < 64) {
      if (64L * sums(b) >= total) {
        nSet += 1
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    AHashMeta(hi, lo, nSet, valid = true)
  }

  private val audioFpUdf = udf(audioFingerprint64 _)

  /** Energy-envelope fingerprint column from a binary WAV column. */
  def audioFingerprint(content: Column): Column = audioFpUdf(content)

  // -------------------------------------------------------------------
  // ISO-BMFF (MP4) box structure — the video-container counterpart of
  // the RIFF walk: [u32 size BE][4CC type][payload], size includes the
  // 8-byte header; size==1 switches to a 64-bit largesize (header 16);
  // size==0 means to-EOF. Only STRUCTURE is parsed (codec payloads
  // stay opaque bytes, per the multimodal model) — enough for the real
  // pipeline decisions: is there a moov (playable/indexable), how big
  // is the media payload, is the file truncated.
  // -------------------------------------------------------------------
  case class Mp4Meta(n_boxes: Long, has_moov: Boolean, mdat_bytes: Long,
                     valid: Boolean)

  def parseMp4Boxes(bytes: Array[Byte]): Mp4Meta = {
    if (bytes == null || bytes.length < 8)
      return Mp4Meta(0L, has_moov = false, 0L, valid = false)
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    var off = 0L
    var n = 0L; var moov = false; var mdat = 0L
    while (off + 8 <= bytes.length) {
      val size0 = be32(off.toInt)
      val typ = new String(bytes.slice(off.toInt + 4, off.toInt + 8), "US-ASCII")
      val (size, hdr) =
        if (size0 == 1L) {
          if (off + 16 > bytes.length)
            return Mp4Meta(n, moov, mdat, valid = false)
          (be64(off.toInt + 8), 16L)
        } else if (size0 == 0L) (bytes.length - off, 8L)
        else (size0, 8L)
      if (size < hdr || off + size > bytes.length)
        return Mp4Meta(n, moov, mdat, valid = false)
      n += 1
      if (typ == "moov") moov = true
      if (typ == "mdat") mdat += size - hdr
      off += size
    }
    Mp4Meta(n, moov, mdat, valid = off == bytes.length)
  }

  private val mp4Udf = udf(parseMp4Boxes _)

  /** MP4 box-structure metadata from a binary column. */
  def mp4Metadata(content: Column): Column = mp4Udf(content)

  /** Synthesize an MP4-like box stream: ftyp, an optional 64-bit
    * largesize free box, moov, mdat with the given payload sizes. */
  def makeMp4Boxes(moovPayload: Int, mdatPayload: Int,
                   withLargesize: Boolean = false): Array[Byte] = {
    val large = if (withLargesize) 16 + 4 else 0
    val buf = java.nio.ByteBuffer.allocate(16 + large + 8 + moovPayload +
      8 + mdatPayload).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(512)
    if (withLargesize)
      buf.putInt(1).put("free".getBytes("US-ASCII")).putLong(20L).putInt(7)
    buf.putInt(8 + moovPayload).put("moov".getBytes("US-ASCII"))
      .put(new Array[Byte](moovPayload))
    buf.putInt(8 + mdatPayload).put("mdat".getBytes("US-ASCII"))
      .put(new Array[Byte](mdatPayload))
    buf.array()
  }

  /** Synthesize a PCM WAV byte array (s16le). Used by tests and the
    * stubbed decode path. */
  def makeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // -------------------------------------------------------------------
  // T1 — binary-in/binary-out subprocess pipe (reference
  // inputs/speech_to_text.py:14-30 ffmpeg resample). One process per
  // ROW through mapPartitions; the partition iterator streams, so
  // memory stays bounded. In production `cmd` is e.g.
  // Seq("ffmpeg","-i","pipe:0","-ac","1","-ar","16000","-f","wav","pipe:1").
  // -------------------------------------------------------------------
  def pipeBinary(df: DataFrame, contentCol: String, cmd: Seq[String],
                 outCol: String = "piped"): DataFrame = {
    val pipeUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
        val writer = new Thread(() => {
          try { p.getOutputStream.write(bytes); p.getOutputStream.close() }
          catch { case _: java.io.IOException => () }
        })
        // stderr MUST be drained concurrently: ffmpeg-style tools write
        // progress there, and an undrained pipe deadlocks the child
        // once the OS buffer fills
        val errBuf = new java.io.ByteArrayOutputStream()
        val errReader = new Thread(() => {
          try p.getErrorStream.transferTo(errBuf)
          catch { case _: java.io.IOException => () }
        })
        writer.start(); errReader.start()
        val out = p.getInputStream.readAllBytes()
        writer.join(); errReader.join()
        val exit = p.waitFor()
        // errors-as-data: failed commands yield null, not a task failure
        if (exit != 0) null else out
      }
    }
    df.withColumn(outCol, pipeUdf(col(contentCol)))
  }

  /** K3 — binary sink: write each row's byte payload as one file named
    * by the id column (reference inputs/system_audio_collector.py:77-80
    * writes out/audio/{id}.wav). foreachPartition so each task writes
    * its own partition's files — no driver collect, no shuffle.
    *
    * `dir` must be visible to every executor (local mode, a shared
    * mount, or fuse-mounted object storage) — the directory is created
    * executor-side so tasks work on whichever host they land. For
    * HDFS/S3 sinks, switch the writes to the Hadoop FileSystem API. */
  def writeBinaryFiles(df: DataFrame, idCol: String, contentCol: String,
                       dir: String, ext: String = ".wav"): Unit = {
    df.select(col(idCol).cast("string"), col(contentCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        rows.foreach { r =>
          val id = r.getString(0)
          require(!id.contains('/') && !id.contains('\\') && !id.contains(".."),
            s"unsafe id: $id")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, id + ext), r.getAs[Array[Byte]](1))
        }
      }
  }

  /** STUB — media decode (image/audio/video to features). The real
    * implementation would shell out to a codec (pipeBinary) or use a
    * JNI decoder; this deterministic fake derives pseudo-features from
    * byte statistics so downstream plumbing (schema, partitioning,
    * aggregation) is fully testable offline. */
  def decodeFeaturesStub(content: Column, nFeatures: Int = 8): Column = {
    // feature_i = md5-derived byte of the content, scaled to [0, 1)
    val hex = md5(content)
    array((0 until nFeatures).map { i =>
      (conv(substring(hex, i * 2 + 1, 2), 16, 10).cast("double") / 256.0)
    }: _*)
  }

  /** Frame-sampling plan for video blobs (every `everySec` seconds up
    * to `maxFrames`) — the Spark-side scheduling is real; the frame
    * EXTRACTION is the stubbed step. Output: one row per planned
    * frame offset. */
  def planFrameSamples(df: DataFrame, durationCol: String,
                       everySec: Double, maxFrames: Int): DataFrame =
    df.withColumn("frame_offset_sec",
      explode(transform(
        sequence(lit(0), least(floor(col(durationCol) / everySec), lit(maxFrames - 1))),
        i => i * everySec)))

  /** STUB — image resize. The real implementation pipes bytes through
    * a codec (`pipeBinary` with e.g. ImageMagick/ffmpeg); this
    * deterministic fake keeps the Spark-side contract real: binary in,
    * (resized binary, typed metadata struct) out, computed row-local
    * with no shuffle. The fake "resized" payload is a truncated,
    * size-proportional slice so downstream size accounting is
    * testable. */
  // --- tar shard walk (the WebDataset container) -------------------------

  /** `offset` = first payload byte within the shard — so downstream
    * extraction is a plain builtin `substring(shard, offset + 1,
    * size)` on the binary column (codegen'd slice, no second walk). */
  case class TarEntry(name: String, size: Long, flag: Int, offset: Long)
  case class TarWalk(valid: Boolean, err: String, n_entries: Long,
                     entries: Seq[TarEntry])

  /** Deterministic ustar writer for fixtures: standard 512-byte
    * headers (octal sizes, space-seeded checksum, "ustar" magic),
    * content padded to the block, two zero blocks as the terminator —
    * the format WebDataset shards use (reference behavior: POSIX.1
    * ustar, public spec). mtime pinned to 0 so identical inputs give
    * identical bytes. */
  def makeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val pad = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(pad.getBytes("UTF-8"), 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(data.length.toLong, 124, 12)
      oct(0, 136, 12) // mtime 0: determinism over realism
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum seed
      h(156) = '0' // regular file
      System.arraycopy("ustar".getBytes("UTF-8"), 0, h, 257, 5)
      h(262) = 0
      System.arraycopy("00".getBytes("UTF-8"), 0, h, 263, 2)
      val sum = h.map(_ & 0xff).sum
      val cs = java.lang.Long.toOctalString(sum.toLong)
      System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("UTF-8"),
        0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Walk a tar shard's headers without touching entry payloads:
    * validate magic + checksum per header (the checksum is the
    * byte-sum of the header with the checksum field read as spaces —
    * the public ustar rule), read the octal size, skip the padded
    * content. Errors are DATA (the corrupt-record posture every
    * binary walk here takes): bad magic / checksum mismatch /
    * truncated content return valid=false with a named err and
    * whatever entries parsed before the fault — a poisoned shard must
    * never fail the task. Byte-level walks are the one place a UDF is
    * inherent (the established repo rule). */
  def tarWalkBytes(b: Array[Byte]): TarWalk = {
    val entries = scala.collection.mutable.ListBuffer.empty[TarEntry]
    if (b == null) return TarWalk(valid = false, "null", 0L, Seq.empty)
    var off = 0
    var sawEnd = false
    while (!sawEnd && off + 512 <= b.length) {
      val allZero = (off until off + 512).forall(b(_) == 0)
      if (allZero) { sawEnd = true }
      else {
        if (!(b(off + 257) == 'u' && b(off + 258) == 's' &&
            b(off + 259) == 't' && b(off + 260) == 'a' &&
            b(off + 261) == 'r'))
          return TarWalk(valid = false, "bad_magic", entries.size.toLong,
            entries.toSeq)
        def octAt(o: Int, len: Int): Long = {
          val s = new String(b, off + o, len, "UTF-8")
            .takeWhile(c => c >= '0' && c <= '7')
          if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
        }
        val stored = octAt(148, 8)
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt
                  else b(off + i) & 0xff)
          i += 1
        }
        if (sum != stored)
          return TarWalk(valid = false, "bad_checksum",
            entries.size.toLong, entries.toSeq)
        val name = new String(b, off, 100, "UTF-8").takeWhile(_ != 0)
        val size = octAt(124, 12)
        entries += TarEntry(name, size, b(off + 156) - '0', off + 512L)
        val padded = ((size + 511L) / 512L) * 512L
        if (off + 512L + padded > b.length)
          return TarWalk(valid = false, "truncated",
            entries.size.toLong, entries.toSeq)
        off += 512 + padded.toInt
      }
    }
    if (!sawEnd)
      return TarWalk(valid = false, "no_terminator",
        entries.size.toLong, entries.toSeq)
    TarWalk(valid = true, "", entries.size.toLong, entries.toSeq)
  }

  /** Column form of [[tarWalkBytes]] — a native codegen expression
    * (functions/MultimodalExpressions), not a UDF: shard listing runs
    * once per shard on the ingest path, and the expression form keeps
    * the plan inside whole-stage codegen with no encoder round trip
    * (the r8 wavMetadata/patchStats discipline, extended to the tar
    * walk per the r11 verdict). */
  def tarWalk(shard: Column): Column =
    org.apache.spark.sql.graftglue.GraftPlanApi.column(
      graft.functions.TarWalkExpr(
        org.apache.spark.sql.graftglue.GraftPlanApi.expression(shard)))

  def resizeStub(content: Column, targetW: Int, targetH: Int): Column = {
    // fake output size scales with target area; capped by the input
    val outLen = least(length(content), lit(targetW * targetH / 8 + 16))
    struct(
      substring(content, 1, targetW * targetH / 8 + 16).as("resized"),
      struct(
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        length(content).cast("bigint").as("orig_bytes"),
        outLen.cast("bigint").as("out_bytes"),
        md5(content).as("source_fp")).as("meta"))
  }
}
