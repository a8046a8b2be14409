package graft

import graft.ops.{Dedup, Relational}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-7 oracle-independence properties (r6 verdict #6): most query
  * oracles are computation MIRRORS (the same algorithm in DuckDB SQL),
  * so a shared conceptual bug would pass both engines. These
  * properties pin the newest non-trivial operators against dumb
  * driver-side brute-force implementations on randomized inputs —
  * a third, structurally different computation path.
  */
class Round7PropSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of Sampling.hashLong: first 8 hex chars of
    * md5(string) parsed base-16. */
  private def md5HashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("property: MaxSim (q277 shape) equals a driver brute force on random vectors") {
    val rnd = new Random(7L)
    val dim = 64
    // floats on the exact milli grid so Spark's round(x*1000) and the
    // driver's math.round agree trivially (never near a .5 boundary)
    val vecs: Seq[(Long, Seq[Float])] = (0L until 40L).map(i =>
      i -> Seq.fill(dim)((rnd.nextInt(4001) - 2000) / 1000.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000, 0).cast("long"))
    val subs = df.select(col("vec_id"), qv.as("__q"))
      .select(col("vec_id"), posexplode(array((0 until 4).map(sl =>
        slice(col("__q"), sl * 16 + 1, 16)): _*)).as(Seq("sub", "v")))
    val probe = broadcast(subs.where(col("vec_id") === 0)
      .select(col("sub").as("qs"), col("v").as("qv")))
    val got = subs.crossJoin(probe)
      .select(col("vec_id"), col("qs"),
        aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"))
      .groupBy("vec_id", "qs").agg(max("dot").as("m"))
      .groupBy("vec_id").agg(sum("m").as("maxsim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = vecs.map { case (i, v) =>
      i -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    val qsubs = (0 until 4).map(s => q(0L).slice(s * 16, s * 16 + 16))
    val want = q.map { case (i, v) =>
      val dsubs = (0 until 4).map(s => v.slice(s * 16, s * 16 + 16))
      i -> qsubs.map(qs => dsubs.map(ds =>
        qs.zip(ds).map { case (a, b) => a * b }.sum).max).sum
    }
    assert(got == want)
  }

  test("property: cdcChunkShares equals a driver brute force on random token docs") {
    val rnd = new Random(11L)
    val mod = 3
    // tiny vocab of already-normalized tokens (lowercase alnum) so
    // Text.tokens == split(" ") and verbatim chunk collisions are
    // common; a planted shared run guarantees cross-doc sharing
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val planted = "aa bb cc dd ee ff"
    val docs: Seq[(Long, String)] = (0L until 30L).map { i =>
      val body = Seq.fill(5 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      i -> (if (i % 4 == 0) s"$planted $body" else body)
    }
    val got = Dedup.cdcChunkShares(docs.toDF("doc_id", "text"),
        "doc_id", "text", modBoundary = mod)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force: a token OPENS a new chunk iff hash % mod == 0
    // (inclusive running sum — the boundary token belongs to the new
    // chunk); instances count as shared when the chunk text occurs in
    // at least one OTHER doc
    def chunksOf(text: String): Seq[String] = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val ids = toks.scanLeft(0L)((acc, t) =>
        acc + (if (md5HashLong(t) % mod == 0) 1L else 0L)).tail
      toks.zip(ids).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(_._1).mkString(" "))
    }
    val chunkSets: Map[Long, Seq[String]] =
      docs.map { case (i, t) => i -> chunksOf(t) }.toMap
    val owners: Map[String, Int] = chunkSets.toSeq
      .flatMap { case (i, cs) => cs.distinct.map(c => (c, i)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.size }
    val want = chunkSets.map { case (i, cs) =>
      val nShared = cs.count(c => owners(c) > 1).toLong
      (i, cs.size.toLong, nShared,
        nShared * 1000000L / math.max(cs.size.toLong, 1L))
    }.toSet
    assert(got == want)
    assert(want.exists(_._3 > 0), "fixture produced no shared chunks")
  }

  test("property: goldenRecord equals a per-field argmax brute force") {
    val rnd = new Random(13L)
    // records: (cluster, ts, id, f1, f2) with nulls, duplicate ts
    // within clusters (id tie-break), empty-string values, all-null
    // fields in some clusters
    val vals = Vector(null, null, "", "x", "yy", "zzz", "w4")
    val recs: Seq[(Long, Long, Long, String, String)] =
      (0L until 120L).map { id =>
        (id % 12, rnd.nextInt(5).toLong, id,
          vals(rnd.nextInt(vals.size)), vals(rnd.nextInt(vals.size)))
      }
    val df = recs.toDF("cluster", "ts", "id", "f1", "f2")
    val got = Relational.goldenRecord(df, "cluster", "ts", "id",
        Seq("f1", "f2"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3)))
      .toSet
    val want = recs.groupBy(_._1).map { case (c, rs) =>
      def survive(get: ((Long, Long, Long, String, String)) => String) = {
        val nn = rs.filter(r => get(r) != null)
        if (nn.isEmpty) None
        else Some(get(nn.maxBy(r => (r._2, r._3))))
      }
      (c, survive(_._4), survive(_._5), rs.size.toLong)
    }.toSet
    assert(got == want)
  }
}
