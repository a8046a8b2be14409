package graft

import org.apache.spark.sql.functions._

/** Round-7x pins: float-Sinkhorn tracks the integer coupling and its
  * marginals converge, the dup-n-gram fraction equals a driver
  * brute-force (shingle → dup set → interval union), and TextRank
  * equals a pure-Scala integer PageRank replay. */
class Round7xSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q379 integer Sinkhorn tracks float Sinkhorn and couples marginals") {
    val rows = graft.queries.Registry.byName("q379_sinkhorn_coupling")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val r = rows.map(x => x._1 -> x._3).toMap // i -> r_milli
    val c = rows.map(x => x._2 -> x._4).toMap // j -> c_milli
    assert(r.values.sum == 1000L && c.values.sum == 1000L)
    def k(i: Long, j: Long): Double = math.pow(2, 7 - math.abs(i - j))
    var v = c.keys.map(_ -> 1000.0).toMap
    var u = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      u = r.map { case (i, ri) =>
        i -> ri * 16384000.0 / v.map { case (j, vj) => k(i, j) * vj }.sum }
      v = c.map { case (j, cj) =>
        j -> cj * 16384000.0 / u.map { case (i, ui) => k(i, j) * ui }.sum }
    }
    rows.foreach { case (i, j, _, _, ppm) =>
      val f = u(i) * k(i, j) * v(j) / 16384.0
      assert(math.abs(ppm - f) <= math.max(2000.0, f * 0.05),
        s"cell ($i,$j): int=$ppm float=$f")
    }
    // after 3 rounds the row marginals couple to r within 15%
    rows.groupBy(_._1).foreach { case (i, cells) =>
      val got = cells.map(_._5).sum.toDouble
      val want = r(i) * 1000.0
      assert(math.abs(got - want) <= want * 0.15 + 2000.0,
        s"row $i marginal $got vs $want")
    }
  }

  test("property: q380 dup-ngram fraction equals a driver brute force") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.ops.Text.tokens(col("text")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toVector))
    val shingles = docs.flatMap { case (id, _, t) =>
      if (t.length < 8) Nil
      else (0 to t.length - 8).map(p => (id, p + 1, t.slice(p, p + 8).mkString(" ")))
    }
    val counts = shingles.groupBy(_._3).map { case (k2, v) => k2 -> v.size }
    val cov = shingles.filter(s => counts(s._3) > 1)
      .groupBy(_._1).map { case (id, ivs) =>
        val sorted = ivs.map(x => (x._2, x._2 + 7)).sortBy(identity)
        var covered = 0L; var curA = Long.MinValue; var curB = Long.MinValue
        sorted.foreach { case (a, b) =>
          if (a > curB) { if (curB != Long.MinValue) covered += curB - curA + 1
            curA = a; curB = b
          } else curB = math.max(curB, b)
        }
        if (curB != Long.MinValue) covered += curB - curA + 1
        id -> covered
      }
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val n = ds.map(_._3.length.toLong).sum
      val dup = ds.map(d => cov.getOrElse(d._1, 0L)).sum
      src -> ((n, dup, dup * 1000000L / n))
    }
    val got = graft.queries.Registry.byName("q380_dup_ngram_fraction")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want && got.nonEmpty)
  }

  test("property: q381 TextRank equals a pure-Scala integer PageRank replay") {
    val docs = Tables.documents(spark, sf)
      .select(graft.ops.Text.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toVector)
    val dirEdges = docs.flatMap(t => t.zip(t.drop(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (hashLong(a), hashLong(b)) }
    val edges = (dirEdges ++ dirEdges.map(_.swap)).distinct
    val deg = edges.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / deg(s) }.sum }
      rank = nodes.map(n =>
        n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    val vocab = docs.flatten.distinct.map(t => hashLong(t) -> t)
    val want = vocab.flatMap { case (id, tok) =>
      rank.get(id).map(r => (tok, r)) }
      .sortBy { case (tok, r) => (-r, tok) }.take(20)
    val got = graft.queries.Registry.byName("q381_textrank_keywords")
      .fn(spark, sf).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq, s"got=${got.take(5).mkString(",")}")
  }
}
