package graft

import graft.ops.{Multimodal, Sampling}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 oracle-INDEPENDENCE properties (VERDICT r8 #5): the three
  * newest mirror-oracled operators re-verified against randomized
  * driver-side brute force — a computation path that shares nothing
  * with either the Spark pipeline or the DuckDB mirror.
  */
class Round9PropSpec extends SparkSpec {
  import spark.implicits._

  // pure-JVM twins of Sampling.hashLong / md5 fingerprints — no Spark
  // expression evaluation anywhere in the reference path
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def hashLongRef(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  // ---- q461: schema matching via content signatures -------------------

  test("q461 shape: sampled-signature overlap equals the brute-force set math") {
    val rnd = new scala.util.Random(911)
    for (trial <- 1 to 3) {
      // random columns with engineered overlap: colB ⊂ colA ∪ noise
      val base = (1 to 400).map(_ => s"v${rnd.nextInt(600)}").distinct
      val cols: Seq[(String, Seq[String])] = Seq(
        "a1" -> base,
        "a2" -> base.filter(_ => rnd.nextBoolean()),
        "b1" -> (base.filter(_ => rnd.nextInt(3) == 0) ++
          (1 to 150).map(_ => s"w${rnd.nextInt(500)}")).distinct,
        "b2" -> (1 to 200).map(_ => s"x${rnd.nextInt(400)}").distinct)
      val schema = StructType(Seq(StructField("col_name", StringType),
        StructField("__v", StringType)))
      def sig(names: Seq[String]) = spark.createDataFrame(
        spark.sparkContext.parallelize(for {
          n <- names; v <- cols.toMap.apply(n)
        } yield Row(n, v), 7), schema)
        .distinct()
        .where(Sampling.hashLong(col("__v")) % 4 === 0)
        .select(col("col_name"), md5(col("__v")).as("fp"))
      // the q461 relational composition on random frames
      val left = sig(Seq("a1", "a2"))
      val right = sig(Seq("b1", "b2"))
      val nA = left.groupBy("col_name").agg(count(lit(1)).as("n_a"))
        .withColumnRenamed("col_name", "col_a")
      val nB = right.groupBy("col_name").agg(count(lit(1)).as("n_b"))
        .withColumnRenamed("col_name", "col_b")
      val shared = left.withColumnRenamed("col_name", "col_a")
        .join(right.withColumnRenamed("col_name", "col_b"), "fp")
        .groupBy("col_a", "col_b").agg(count(lit(1)).as("n_shared"))
      val got = nA.crossJoin(nB)
        .join(shared, Seq("col_a", "col_b"), "left")
        .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .withColumn("jaccard_ppm",
          expr("(n_shared * 1000000) div (n_a + n_b - n_shared)"))
        .withColumn("containment_a_ppm",
          expr("(n_shared * 1000000) div n_a"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))).toMap

      // brute force: pure-Scala signatures + set intersections
      val refSig: Map[String, Set[String]] = cols.toMap.map { case (n, vs) =>
        n -> vs.toSet.filter(v => hashLongRef(v) % 4 == 0).map(md5Hex)
      }
      for (a <- Seq("a1", "a2"); b <- Seq("b1", "b2")) {
        val sa = refSig(a); val sb = refSig(b)
        val sh = (sa & sb).size.toLong
        val want = (sa.size.toLong, sb.size.toLong, sh,
          sh * 1000000L / (sa.size + sb.size - sh),
          sh * 1000000L / sa.size)
        assert(got((a, b)) === want, s"trial $trial pair ($a,$b)")
      }
    }
  }

  // ---- q472: SymSpell deletion-neighborhood variants -------------------

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def delVariants(t: String): Set[String] =
    (0 to t.length).map { i =>
      if (i == 0) t else t.substring(0, i - 1) + t.substring(i)
    }.toSet

  test("q472 shape: deletion-blocked lev<=2 pairs equal the brute-force scan") {
    val rnd = new scala.util.Random(472)
    val alpha = "abcd"
    for (trial <- 1 to 3) {
      val toks = (1 to 120).map { _ =>
        val n = 2 + rnd.nextInt(5)
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val counts = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val vocab = toks.toDF("tok").groupBy("tok").agg(count(lit(1)).as("c"))
      // the q472 relational composition on random tokens
      val variants = vocab.select(col("tok"), col("c"),
        explode(expr("transform(sequence(0, length(tok)), i -> " +
          "IF(i = 0, tok, concat(substring(tok, 1, i - 1), " +
          "substring(tok, i + 1, length(tok) - i))))")).as("dvar"))
        .distinct()
      val got = variants.as("a").join(variants.as("b"),
          col("a.dvar") === col("b.dvar") && col("a.tok") < col("b.tok"))
        .select(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"),
          col("a.c").as("c_a"), col("b.c").as("c_b"))
        .distinct()
        .withColumn("lev", levenshtein(col("tok_a"), col("tok_b")))
        .where(col("lev") <= 2)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getInt(4))).toSet

      // brute force: quadratic scan with an independent Levenshtein
      val uniq = toks.distinct.sorted
      val want = (for {
        a <- uniq; b <- uniq if a < b
        if (delVariants(a) & delVariants(b)).nonEmpty
        lev = levRef(a, b) if lev <= 2
      } yield (a, b, counts(a), counts(b), lev)).toSet
      assert(got === want, s"trial $trial")
      assert(want.nonEmpty, "degenerate trial: no candidate pairs")
      // the blocking's guarantee holds on this corpus: every lev<=1
      // pair is deletion-blocked (lev<=2 only partially, by design)
      for (a <- uniq; b <- uniq if a < b && levRef(a, b) <= 1)
        assert((delVariants(a) & delVariants(b)).nonEmpty,
          s"lev<=1 pair ($a,$b) missed by the blocking")
    }
  }

  // ---- q482: image near-dup banding + Hamming verification -------------

  test("q482 shape: band-join candidates + Hamming gate equal the quadratic scan") {
    val rnd = new scala.util.Random(482)
    val mk = udf { (key: Long) =>
      val base = key / 2
      val px = Array.tabulate(1024) { i =>
        val x = i % 32; val y = i / 32
        (((x * 7 + y * 13 + base * 31) % 256 +
          (key % 2) * ((x + y) % 3)) % 256).toInt
      }
      Multimodal.makeBmp(32, 32, px)
    }
    val ids = (1L to 48L) ++ Seq(101L, 103L, 107L).map(_ * 2) // odd gaps
    val hs = ids.toDF("id")
      .select(col("id"), Multimodal.imagePHash(mk(col("id"))).as("h"))
      .select(col("id"), col("h.hash_hi").as("hi"), col("h.hash_lo").as("lo"))
      .localCheckpoint()
    // the q482 relational composition: 4x16-bit bands -> equi-join ->
    // exact Hamming <= 6
    val bands = hs.select(col("id"), col("hi"), col("lo"),
      posexplode(expr("array(lo & 65535, shiftright(lo, 16) & 65535, " +
        "hi & 65535, shiftright(hi, 16) & 65535)"))
        .as(Seq("band", "bval")))
    val got = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bval") === col("b.bval") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.hi").as("hi_a"), col("a.lo").as("lo_a"),
        col("b.hi").as("hi_b"), col("b.lo").as("lo_b"))
      .distinct()
      .withColumn("hamming", expr(
        "bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").cast("long"))
      .where(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute force: quadratic popcount scan over the collected hashes
    // (driver-side Long.bitCount — no Spark expressions)
    val hv = hs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bandsOf(hi: Long, lo: Long): Seq[Long] =
      Seq(lo & 65535L, (lo >> 16) & 65535L, hi & 65535L, (hi >> 16) & 65535L)
    val want = (for {
      (a, hiA, loA) <- hv; (b, hiB, loB) <- hv if a < b
      if bandsOf(hiA, loA).zip(bandsOf(hiB, loB)).exists(p => p._1 == p._2)
      hm = java.lang.Long.bitCount(hiA ^ hiB) +
        java.lang.Long.bitCount(loA ^ loB) if hm <= 6
    } yield (a, b, hm.toLong)).toSet
    assert(got === want)
    // planted near-dup pairs (2j, 2j+1) within <=6 Hamming must surface
    val planted = want.collect { case (a, b, _) if b == a + 1 && a % 2 == 0 => a }
    assert(planted.nonEmpty, "no planted pair survived — synthesis broke")
    graft.ops.Checkpoints.free(hs)
  }
}
