package graft

import graft.ops.{CorpusStats, FixedPoint, Text}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-independence properties for the corpus-statistics operators
  * (q443/q444/q445): randomized token corpora re-scored by driver-side
  * brute force — flat Scala maps and loops sharing nothing with the
  * Spark pipelines except the FixedPoint table (the single source of
  * truth both engines print their fragments from).
  */
class Round8gPropSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("grp", StringType),
    StructField("toks", ArrayType(StringType))))

  private def mkDocs(rows: Seq[(Long, String, Seq[String])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 5), schema)

  // driver-side FixedPoint replica (positive operands only)
  private def ratioFp20(n: Long, d: Long): Long =
    FixedPoint.One + (n / d) * FixedPoint.One + ((n % d) * FixedPoint.One) / d
  private def log2Micro(r: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(r)
    (b - FixedPoint.Frac).toLong * 1000000L +
      FixedPoint.log2Tab(((r >> (b - 8)) - 256).toInt)
  }
  private def lnMicro(r: Long): Long = log2Micro(r) * FixedPoint.Ln2Micro / 1000000L

  test("q443 PMI collocations: random corpus equals brute force") {
    val rnd = new scala.util.Random(843)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val docs = (1L to 60L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, "g", Seq.fill(n)(vocab(rnd.nextInt(vocab.length))))
      }
      val got = CorpusStats.pmiCollocations(mkDocs(docs), "toks",
          minCount = 2, topK = 10)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

      val toks = docs.flatMap(_._3)
      val uni = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val nn = toks.size.toLong
      val bigs = docs.flatMap(d => d._3.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq)
      val big = bigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val bb = bigs.size.toLong
      val want = big.toSeq.flatMap { case ((w1, w2), c12) =>
        val (c1, c2) = (uni(w1), uni(w2))
        val a = c12 * nn * nn; val b = bb * c1 * c2
        if (c12 >= 2 && a > b)
          Some((w1, w2, c12, c1, c2, lnMicro(ratioFp20(a - b, b))))
        else None
      }.sortBy(t => (-t._6, t._1, t._2)).take(10)
      assert(got == want, s"trial $trial")
    }
  }

  test("q444 code-switch segments: random corpus equals brute force") {
    val rnd = new scala.util.Random(844)
    val markers = Text.stopwords.toSeq.sortBy(_._1).flatMap(_._2).toVector
    val noise = Vector("zzz", "qqq", "xxx")
    val pool = markers ++ noise ++ noise // noise-heavy mix
    for (trial <- 1 to 3) {
      val docs = (1L to 80L).map { id =>
        val n = 1 + rnd.nextInt(10)
        (id, if (id % 2 == 0) "s0" else "s1",
          Seq.fill(n)(pool(rnd.nextInt(pool.length))))
      }
      val got = CorpusStats.codeSwitchSegments(mkDocs(docs), "doc_id", "toks",
          keep = Seq("grp"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

      val langs = Text.stopwords.toSeq.sortBy(_._1)
      def lg(t: String): Option[String] =
        langs.collectFirst { case (l, ws) if ws.contains(t) => l }
      val want = docs.flatMap { case (id, grp, ts) =>
        val ev = ts.flatMap(lg(_))
        if (ev.isEmpty) None
        else {
          val nSeg = 1 + ev.sliding(2).count(p => p.size == 2 && p(0) != p(1))
          Some((id, grp, ev.size.toLong, nSeg.toLong))
        }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("q445 bigram surprisal: random corpus equals brute force") {
    val rnd = new scala.util.Random(845)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 1 to 3) {
      val docs = (1L to 50L).map { id =>
        val n = 1 + rnd.nextInt(9)
        (id, "g", Seq.fill(n)(vocab(rnd.nextInt(vocab.length))))
      }
      val got = CorpusStats.bigramSurprisal(mkDocs(docs), "doc_id", "toks",
          keep = Seq("grp"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      val toks = docs.flatMap(_._3)
      val uni = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val vv = uni.size.toLong
      val bigs = docs.flatMap(d => d._3.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq)
      val big = bigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val want = docs.flatMap { case (id, grp, ts) =>
        val ps = ts.sliding(2).filter(_.size == 2).toSeq
        if (ps.isEmpty) None
        else {
          val sups = ps.map { p =>
            val c1 = uni(p(0)); val c12 = big((p(0), p(1)))
            lnMicro(ratioFp20(c1 + vv - c12 - 1, c12 + 1))
          }
          Some((id, grp, sups.sum / sups.size))
        }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }
}
