package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-7e pins: intra-doc segment dedup against a driver brute
  * force on random docs, bootstrap-CI invariants, and a full driver
  * replay of the nDCG@10 pipeline — oracle independence for the new
  * eval lane. */
class Round7eSpec extends SparkSpec {
  import spark.implicits._

  test("property: intraDocSegmentDedup equals a driver brute force") {
    val rnd = new Random(23L)
    // tiny vocab so intra-doc repeats actually happen on the 4-grid
    val docs = (0L until 30L).map { i =>
      i -> Seq.fill(4 * (1 + rnd.nextInt(12)))("w" + rnd.nextInt(3))
        .mkString(" ")
    }
    val got = Dedup.intraDocSegmentDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", segTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val segs = toks.grouped(4).map(_.mkString(" ")).toSeq
      val seen = collection.mutable.Set.empty[String]
      val kept = segs.filter(seen.add)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(id) == ((segs.length.toLong, kept.length.toLong,
        (segs.length - kept.length).toLong, md)), s"doc $id")
    }
  }

  test("q304 bootstrap CI: deterministic, ordered, and inside the data range") {
    val q = graft.queries.Registry.byName("q304_poisson_bootstrap_ci")
    val a = q.fn(spark, sf).collect().head
    val b = q.fn(spark, sf).collect().head
    assert(a == b) // md5 draws -> bit-identical replicates
    val (point, lo, hi) = (a.getLong(1), a.getLong(3), a.getLong(4))
    assert(lo <= hi)
    val mm = Tables.documents(spark, sf)
      .agg(min("n_chars"), max("n_chars")).collect().head
    assert(lo >= mm.getLong(0) * 1000000L && hi <= mm.getLong(1) * 1000000L)
    // the 95% interval of a mean over hundreds of docs is tight around
    // the point estimate; a slipped index or weight bug blows this up
    assert(math.abs(point - lo) < point / 2 &&
      math.abs(hi - point) < point / 2)
  }

  test("property: q307 nDCG@10 equals a full driver replay") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 1000)).toArray))
    val ilog = (1 to 10).map(i =>
      math.round(1000000.0 / (StrictMath.log(i + 1.0) / StrictMath.log(2.0))))
    val labelN = emb.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    val want = emb.filter(_._1 < 20).map { case (qid, qlab, qv) =>
      val ranked = emb.filter(_._1 != qid)
        .map { case (nid, nlab, v) =>
          (nid, nlab, v.zip(qv).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (nid, _, dot) => (-dot, nid) }.take(10)
      val dcg = ranked.zipWithIndex.collect {
        case ((_, nlab, _), i) if nlab == qlab => 7L * ilog(i)
      }.sum
      val m = math.min(labelN(qlab) - 1, 10)
      val idcg = 7L * ilog.take(m).sum
      qid -> ((ranked.count(_._2 == qlab).toLong, dcg, idcg,
        dcg * 1000000L / idcg))
    }.toMap
    val got = graft.queries.Registry.byName("q307_ndcg_at_10")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q306 matryoshka recall: internal consistency and self-recall") {
    val rows = graft.queries.Registry.byName("q306_matryoshka_recall")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ov, ppm) = (r.getLong(1), r.getLong(2))
      assert(ov >= 0L && ov <= 10L)
      assert(ppm == ov * 1000000L / 10L)
    }
  }
}
