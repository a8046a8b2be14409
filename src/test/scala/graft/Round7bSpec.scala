package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-7 second batch: SFT loss masking against a driver brute
  * force, streaming/batch parity for the Bloom gate, and transition
  * conservation for the sequence-mining readout. */
class Round7bSpec extends SparkSpec {
  import spark.implicits._

  private def md5HashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q294: loss-mask spans equal a driver brute force on random token docs") {
    val rnd = new Random(17L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs: Seq[(Long, String)] = (0L until 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    // run the q294 pipeline shape on the fixture via the registry is
    // not possible (it reads the corpus), so replicate the exact
    // column program on the fixture frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__p"))
      .rowsBetween(Long.MinValue, 0)
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(graft.ops.Text.tokens(col("text"))).as(Seq("__p", "__t")))
      .withColumn("__b",
        (graft.ops.Sampling.hashLong(col("__t")) % 5 === 0).cast("long"))
      .withColumn("__turn", sum("__b").over(w))
    val got = toks.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("__turn")).as("n_turns"),
        sum(when(col("__turn") % 2 === 1, 1L).otherwise(0L)).as("n_loss"),
        sum(when(col("__turn") % 2 === 1, col("__p").cast("long"))
          .otherwise(0L)).as("ck"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val want = docs.filter(_._2.nonEmpty).map { case (i, text) =>
      val ts = text.split(" ").filter(_.nonEmpty).toSeq
      val turns = ts.scanLeft(0L)((acc, t) =>
        acc + (if (md5HashLong(t) % 5 == 0) 1L else 0L)).tail
      val loss = turns.zipWithIndex.filter(_._1 % 2 == 1)
      i -> ((ts.size.toLong, turns.distinct.size.toLong, loss.size.toLong,
        loss.map(_._2.toLong).sum))
    }.toMap
    assert(got == want)
  }

  test("q295: the streaming Bloom gate equals the batch bloomClaimed flags") {
    val docs = Tables.documents(spark, sf)
    val existing = docs.where(col("doc_id") % 10 =!= 0)
      .select(md5(graft.ops.Text.normText(col("text"))).as("fp"))
    val incoming = docs.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), md5(graft.ops.Text.normText(col("text"))).as("fp"))
    val batch = graft.ops.Dedup.bloomClaimed(existing, incoming, "fp",
        1 << 15, 4)
      .select("doc_id", "claimed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val streamed = graft.queries.Registry.byName("q295_streaming_bloom_gate")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q296: per-pair supports conserve the total transition count") {
    val rows = graft.queries.Registry.byName("q296_event_transitions")
      .fn(spark, sf)
    // the top-20 rows all carry the same denominator: support <= out_n,
    // support <= in_n, and lift is positive
    val bad = rows.where(col("support") > col("out_n") ||
      col("support") > col("in_n") || col("lift_micro") <= 0).count()
    assert(bad == 0L)
    // no global window: the lead() runs per user
    val p = graft.queries.Registry.byName("q296_event_transitions")
      .fn(spark, sf).queryExecution.executedPlan.toString
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("user_id")),
      winLines.mkString("\n"))
  }

  test("q297 machinery: PQ cascade with a full-corpus pool degenerates to exact search") {
    // with the candidate pool >= corpus size, PQ+rerank must return
    // EXACTLY the brute-force top-k (same rounding, same tie-breaks) —
    // the cascade loses nothing but the pruning
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < 5)
    val books = Similarity.pqTrain(emb, nSub = 8, width = 8, nCodes = 8)
    val cand = Similarity.pqAdcTopK(emb, queries, books, width = 8, k = 1000000)
      .select("query_id", "neighbor_id")
    val rr = Similarity.rerankExact(emb, cand, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bf = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rr.nonEmpty && rr == bf)
  }
}
