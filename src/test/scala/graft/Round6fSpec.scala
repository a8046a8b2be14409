package graft

import graft.ops.{Dedup, Eval, Multimodal}
import org.apache.spark.sql.functions._

/** Round-6f operators: exact ROC AUC, BMP average-hash, window
  * novelty. */
class Round6fSpec extends SparkSpec {
  import spark.implicits._

  // ---- Eval.aucPpm -------------------------------------------------

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long) = {
    val df = rows.toDF("score", "is_pos")
    val r = Eval.aucPpm(df, "score", "is_pos").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("AUC is 1e6 for perfect separation, 0 for inverted") {
    assert(auc(Seq((10L, true), (11L, true), (1L, false), (2L, false)))
      == ((2L, 2L, 8L, 1000000L)))
    assert(auc(Seq((1L, true), (2L, true), (10L, false), (11L, false)))
      == ((2L, 2L, 0L, 0L)))
  }

  test("AUC gives exactly half credit to cross-class ties") {
    // one tied pair out of P*N=4: U2 = 2*3 + 1 = 7 -> 875000 ppm
    assert(auc(Seq((5L, true), (9L, true), (1L, false), (5L, false)))
      == ((2L, 2L, 7L, 875000L)))
    // all scores equal: U2 = P*N -> exactly 500000 ppm
    assert(auc(Seq((3L, true), (3L, true), (3L, false), (3L, false)))
      == ((2L, 2L, 4L, 500000L)))
  }

  test("AUC matches a brute-force pair count on a mixed case") {
    val rows = Seq((4L, true), (7L, true), (7L, false), (2L, false),
      (9L, true), (4L, false), (1L, true))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val want = u2 * 1000000L / (2L * pos.size * neg.size)
    assert(auc(rows) == ((pos.size.toLong, neg.size.toLong, u2, want)))
  }

  // ---- Multimodal.makeBmp / averageHash ----------------------------

  test("aHash of a constant image sets all 64 bits (ties count as set)") {
    val bmp = Multimodal.makeBmp(8, 8, Array.fill(64)(77))
    val h = Multimodal.averageHash(bmp)
    assert(h.valid && h.n_set == 64L &&
      h.hash_lo == 0xffffffffL && h.hash_hi == 0xffffffffL)
  }

  test("aHash bit order is row-major top-down through the bottom-up rows") {
    // top half bright, bottom half dark -> bits 0..31 set, 32..63 clear
    val px = Array.tabulate(64)(i => if (i < 32) 200 else 0)
    val h = Multimodal.averageHash(Multimodal.makeBmp(8, 8, px))
    assert(h.valid && h.n_set == 32L &&
      h.hash_lo == 0xffffffffL && h.hash_hi == 0L)
  }

  test("aHash block-averages a 16x16 image with the stride-padded walk") {
    // 16x16: each 2x2 block uniform; brighter blocks on the left column
    val px = Array.tabulate(256) { i =>
      val r = i / 16; val c = i % 16
      if ((c / 2) == 0) 255 else 0
    }
    val h = Multimodal.averageHash(Multimodal.makeBmp(16, 16, px)) // 16*3=48 bytes/row: stride exact
    // left 8x8-block column set (bits 0,8,16,...,56)
    val want = (0 until 8).map(b => 1L << (b * 8)).reduce(_ | _)
    assert(h.valid && h.n_set == 8L &&
      (h.hash_lo | (h.hash_hi << 32)) == want)
  }

  test("aHash is invariant to top-down vs bottom-up row storage") {
    val px = Array.tabulate(64)(i => (i * 37) % 256)
    val bmp = Multimodal.makeBmp(8, 8, px)
    // flip to top-down: negate height, reverse pixel rows
    val flipped = bmp.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-8).array()
    System.arraycopy(negH, 0, flipped, 22, 4)
    val stride = 8 * 3 // width 8 -> 24 bytes, already 4-aligned
    for (r <- 0 until 8; b <- 0 until stride)
      flipped(54 + r * stride + b) = bmp(54 + (7 - r) * stride + b)
    val a = Multimodal.averageHash(bmp)
    val b = Multimodal.averageHash(flipped)
    assert(a.valid && b.valid && a.hash_lo == b.hash_lo &&
      a.hash_hi == b.hash_hi && a.n_set == b.n_set)
  }

  test("aHash treats corrupt and non-multiple-of-8 input as data") {
    assert(!Multimodal.averageHash(Array[Byte](1, 2, 3)).valid)
    assert(!Multimodal.averageHash("not a bmp".getBytes).valid)
    val odd = Multimodal.makeBmp(8, 8, Array.fill(64)(1))
    // patch width to 12 (not a multiple of 8) -> valid=false
    val w12 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(12).array()
    System.arraycopy(w12, 0, odd, 18, 4)
    assert(!Multimodal.averageHash(odd).valid)
    // truncated pixel data -> valid=false, no exception
    val trunc = Multimodal.makeBmp(8, 8, Array.fill(64)(1)).take(100)
    assert(!Multimodal.averageHash(trunc).valid)
  }

  // ---- Multimodal.parseMp4Boxes ------------------------------------

  test("MP4 box walk handles largesize, truncation, and to-EOF sizes") {
    val ok = Multimodal.parseMp4Boxes(
      Multimodal.makeMp4Boxes(10, 25, withLargesize = true))
    assert(ok.valid && ok.n_boxes == 4L && ok.has_moov && ok.mdat_bytes == 25L)
    val plain = Multimodal.parseMp4Boxes(Multimodal.makeMp4Boxes(0, 0))
    assert(plain.valid && plain.n_boxes == 3L && plain.mdat_bytes == 0L)
    // truncated mid-box: data up to the cut is reported, valid=false
    val trunc = Multimodal.parseMp4Boxes(
      Multimodal.makeMp4Boxes(10, 25).dropRight(5))
    assert(!trunc.valid && trunc.has_moov)
    assert(!Multimodal.parseMp4Boxes(Array[Byte](0, 0)).valid)
    // size==0 (to EOF): final box swallows the rest
    val buf = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(0).put("mdat".getBytes("US-ASCII")).put(new Array[Byte](12))
    val eof = Multimodal.parseMp4Boxes(buf.array())
    assert(eof.valid && eof.n_boxes == 1L && eof.mdat_bytes == 12L)
  }

  // ---- Multimodal.audioFingerprint64 -------------------------------

  test("audio fingerprint sets bits for above-mean energy windows") {
    // 64 windows x 4 frames: first 32 windows loud, rest silent
    val samples = Array.tabulate[Short](256)(i => if (i < 128) 800 else 0)
    val h = Multimodal.audioFingerprint64(Multimodal.makeWav(16000, 1, samples))
    assert(h.valid && h.n_set == 32L &&
      h.hash_lo == 0xffffffffL && h.hash_hi == 0L)
    // constant clip: ties count as set -> all 64 bits
    val c = Multimodal.audioFingerprint64(
      Multimodal.makeWav(16000, 1, Array.fill[Short](256)(100)))
    assert(c.valid && c.n_set == 64L)
  }

  test("audio fingerprint treats corrupt, stereo, and ragged input as data") {
    assert(!Multimodal.audioFingerprint64(Array[Byte](1, 2, 3)).valid)
    val stereo = Multimodal.makeWav(16000, 2, Array.fill[Short](256)(5))
    assert(!Multimodal.audioFingerprint64(stereo).valid)
    // 100 frames: not divisible into 64 windows
    val ragged = Multimodal.makeWav(16000, 1, Array.fill[Short](100)(5))
    assert(!Multimodal.audioFingerprint64(ragged).valid)
  }

  // ---- Dedup.hammingNearDupPairs64 ---------------------------------

  test("banded 64-bit hamming join equals brute force (pigeonhole exact)") {
    // fingerprints as (hi, lo) halves; distances spread across bands
    val rng = new scala.util.Random(7)
    val fps = (1L to 40L).map { id =>
      val base = if (id % 2 == 0) 0x12345678L else 0x7fedcba9L
      // flip up to 9 random bits of the 64 so some pairs exceed 7
      var hi = base; var lo = base ^ 0x0f0f0f0fL
      (0 until rng.nextInt(10)).foreach { _ =>
        val b = rng.nextInt(64)
        if (b < 32) lo ^= 1L << b else hi ^= 1L << (b - 32)
      }
      (id, hi, lo)
    }
    val df = fps.toDF("id", "hi", "lo")
    val got = Dedup.hammingNearDupPairs64(df, "id", "hi", "lo", maxHamming = 7)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, ha, la) <- fps; (b, hb, lb) <- fps if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 7
    } yield (a, b, d)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("hamming64 block cap drops degenerate blocks only") {
    // 5 identical fingerprints blow past a cap of 3 in every band ->
    // all their pairs drop; a distinct near pair survives
    val df = (Seq.fill(5)((0x11L, 0x22L)).zipWithIndex.map {
      case ((h, l), i) => (i.toLong + 1, h, l)
    } ++ Seq((10L, 0x40000011L, 0x22L), (11L, 0x40000011L, 0x23L)))
      .toDF("id", "hi", "lo")
    val got = Dedup.hammingNearDupPairs64(df, "id", "hi", "lo",
        maxHamming = 2, maxBlock = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)))
  }

  // ---- Similarity.lshTopKMultiProbe --------------------------------

  test("multi-probe recall dominates single-table at the same planes") {
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(graft.ops.Similarity.bruteForceTopK(emb, queries, 5))
    val single = pairs(graft.ops.Similarity.lshTopK(emb, queries, 5, nPlanes = 4))
    val multi = pairs(graft.ops.Similarity.lshTopKMultiProbe(
      emb, queries, 5, nPlanes = 4))
    // probe set includes the exact bucket -> candidates are a superset;
    // ranking by exact cosine makes recall monotone in the candidate set
    assert(truth.intersect(multi).size >= truth.intersect(single).size)
    assert(multi.nonEmpty)
  }

  // ---- Relational.percentileContExact ------------------------------

  test("percentile_cont interpolation is exact and handles n=1 groups") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 40L), ("a", 80L),
      ("b", 7L)).toDF("g", "v")
    val got = graft.ops.Relational.percentileContExact(df, "g", "v",
        Seq(50, 90))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    // a: p50 pos=150 -> 20*50+40*50=3000; p90 pos=270 -> 40*30+80*70=6800
    assert(got == Seq(("a", 3000L, 6800L), ("b", 700L, 700L)))
    // cross-check against Spark's own exact percentile on the doubles
    val sp = df.where(col("g") === "a")
      .agg(expr("percentile(v, array(0.5, 0.9))")).collect()(0)
      .getSeq[Double](0)
    assert(sp == Seq(30.0, 68.0))
  }

  // ---- Graph.labelPropagation --------------------------------------

  test("label propagation keeps bridged dense clusters distinct") {
    // two triangles joined by one bridge edge (3-4)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = graft.ops.Graph.labelPropagation(e, "src", "dst", rounds = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // hand-replayed synchronous rounds (argmax count, min-label ties):
    // r1: 1->2 2->1 3->1 4->3 5->4 6->4
    // r2: 1->1 2->1 3->1 4->4 5->3 6->3
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 3L), (6L, 3L)))
    // triangle A ends uniformly labeled; no A label leaks into B
    assert(got.filter(_._1 <= 3).map(_._2).toSet == Set(1L))
    assert(got.filter(_._1 >= 4).map(_._2).toSet.intersect(Set(1L, 2L)).isEmpty)
  }

  // ---- Text.sortedNeighborLcp --------------------------------------

  test("sorted-neighbor LCP pairs each doc with its in-block predecessor") {
    val docs = Seq(
      (1L, "the cat sat down"),     // block "the": order by text
      (2L, "the cat sat up"),       //   prev=1 -> lcp 3
      (3L, "the dog ran"),          //   prev=2 -> lcp 1
      (4L, "zebra stripes"),        // block "zebra": first -> null
      (5L, "the cat sat down"),     //   identical to 1, ties on id
      (6L, "")                      // empty: block "", no predecessor
    ).toDF("doc_id", "text")
    val got = graft.ops.Text.sortedNeighborLcp(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Long])].collect().toSeq
    // block "the" text order: (1) "the cat sat down", (5) same text,
    // (2) "the cat sat up", (3) "the dog ran"
    assert(got == Seq(
      (1L, 4L, None),
      (2L, 4L, Some(3L)),
      (3L, 3L, Some(1L)),
      (4L, 2L, None),
      (5L, 4L, Some(4L)),
      (6L, 0L, None)))
  }

  // ---- Dedup.prefixDupPairs ----------------------------------------

  test("prefix dup pairs finds proper prefixes only, above minPrefix") {
    val t = "w1 w2 w3 w4 w5 w6 w7 w8".split(" ").toSeq
    val docs = Seq(
      (1L, t ++ Seq("x", "y", "z")),     // superset of 2 and 3
      (2L, t ++ Seq("x")),               // prefix of 1
      (3L, t),                           // prefix of 1 and 2
      (4L, t.take(7)),                   // below minPrefix: ignored
      (5L, t ++ Seq("x", "y", "z")),     // identical to 1: NOT a pair
      (6L, Seq("a", "b") ++ t)           // different first tokens
    ).toDF("doc_id", "toks")
    val got = Dedup.prefixDupPairs(docs, "doc_id", "toks", minPrefix = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 1L), (3L, 1L), (3L, 2L), (2L, 5L), (3L, 5L)))
  }

  // ---- Text.mergeAdjacentPair / bpeMergeRound ----------------------

  private def merge(toks: Seq[String], x: String, y: String): Seq[String] = {
    val df = Seq(Tuple1(toks)).toDF("t")
    df.select(graft.ops.Text.mergeAdjacentPair(col("t"),
        lit(x), lit(y), "_").as("m"))
      .as[Seq[String]].collect()(0)
  }

  test("mergeAdjacentPair merges every non-overlapping site") {
    assert(merge(Seq("a", "b", "a", "b", "c"), "a", "b")
      == Seq("a_b", "a_b", "c"))
    assert(merge(Seq("a", "a", "b"), "a", "b") == Seq("a", "a_b"))
    assert(merge(Seq("x", "y", "y"), "x", "y") == Seq("x_y", "y"))
    assert(merge(Seq("b", "a"), "a", "b") == Seq("b", "a"))   // no site
    assert(merge(Seq("a"), "a", "b") == Seq("a"))             // too short
    assert(merge(Seq.empty[String], "a", "b") == Seq.empty)
  }

  test("bpeMergeRound picks the argmax pair with (x, y) tie-break") {
    val docs = Seq(
      (1L, Seq("t", "u", "t", "u")),    // (t,u) x2, (u,t) x1
      (2L, Seq("p", "q")),              // (p,q) x1
      (3L, Seq("t", "u"))               // (t,u) -> 3 total
    ).toDF("doc_id", "toks")
    val (m, best) = graft.ops.Text.bpeMergeRound(docs, "toks")
    assert(best.as[(String, String, Long)].collect().toSeq
      == Seq(("t", "u", 3L)))
    val got = m.orderBy("doc_id").select("toks")
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("t_u", "t_u"), Seq("p", "q"), Seq("t_u")))
  }

  test("bpeMergeRound ignores self-pairs (x == y)") {
    val docs = Seq((1L, Seq("a", "a", "a", "b", "c"))).toDF("doc_id", "toks")
    val (_, best) = graft.ops.Text.bpeMergeRound(docs, "toks")
    // (a,a) x2 is excluded; survivors all count 1 -> lexicographic
    assert(best.as[(String, String, Long)].collect().toSeq
      == Seq(("a", "b", 1L)))
  }

  // ---- Dedup.windowNovelty -----------------------------------------

  test("window novelty credits the smallest-id owner of each window") {
    val docs = Seq(
      (1L, "a b c d e"),        // windows: abc bcd cde -> all novel
      (2L, "a b c d e"),        // identical -> 0 novel
      (3L, "a b c x y z"),      // abc (owned by 1), bcx cxy xyz novel
      (4L, "q r")               // too short: 0 windows, null ppm
    ).toDF("doc_id", "text")
    val got = Dedup.windowNovelty(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, Some(1000000L)),
      (2L, 3L, 0L, Some(0L)),
      (3L, 4L, 3L, Some(750000L)),
      (4L, 0L, 0L, None)))
  }
}
