package graft

import graft.ops.{Graph, Relational, Similarity}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: directed cycle is the exact fixed point") {
    // out-degree 1 everywhere: r' = 150000 + 85% * r keeps r at exactly
    // 1,000,000 micro-units — integer arithmetic included
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: hub of a star collects the spokes' rank") {
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) > r(2L) && r(0L) > r(3L))
    assert(r(1L) > r(2L))          // 1 receives the hub's whole out-mass
    assert(r(2L) == r(3L))         // symmetric spokes tie exactly
  }

  test("pageRank is partition-order-independent (exact integer scores)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").limit(2000)
    val e = li.withColumnRenamed("l_partkey", "src")
      .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
      .where(col("src") =!= col("dst"))
      .select("src", "dst")
    val a = Graph.pageRank(e, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(e.repartition(7), "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter: zero false negatives, low measured fp rate") {
    val keys = (0L until 100L).toDF("k")
    val lanes = Relational.bloomLanes(keys, "k", mBits = 2048, kHashes = 3)
    val probes = (0L until 1000L).toDF("k")
      .crossJoin(broadcast(lanes))
      .withColumn("hit",
        Relational.bloomMightContain(col("bloom_lanes"), col("k"), 2048, 3))
    val hits = probes.where(col("hit")).select("k").as[Long].collect().toSet
    assert((0L until 100L).forall(hits.contains), "false negative!")
    // n=100 keys in m=2048 bits, k=3: expected fpr ~0.3%; assert a
    // loose deterministic bound (md5 hashing makes the count a constant)
    assert(hits.count(_ >= 100L) <= 45, s"fp count ${hits.count(_ >= 100L)}")
  }

  test("bloomSemiJoin equals the plain semi join (false positives removed)") {
    val orders = Tables.orders(spark, sf)
    val keys = orders.where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val li = Tables.lineitem(spark, sf)
    val viaBloom = Relational.bloomSemiJoin(li, "l_orderkey", keys, "o_orderkey")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val plain = li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(viaBloom == plain && plain.nonEmpty)
  }
}

class Sq8Spec extends SparkSpec {
  import spark.implicits._

  test("sq8Quantize: components are integers in [-127, 127], norms exact") {
    val emb = Tables.embeddings(spark, sf)
    val q = Similarity.sq8Quantize(emb, "vec_id", "embedding")
    val rows = q.select(col("__q"), col("__qn2")).as[(Seq[Float], Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (vec, n2) =>
      assert(vec.forall(v => v == math.rint(v) && math.abs(v) <= 127f))
      val exact = vec.map(v => v.toDouble * v.toDouble).sum
      assert(n2 == exact)               // integer-exact in double
      if (vec.exists(_ != 0f))          // zero vectors quantize to zero
        assert(vec.exists(v => math.abs(v) == 127f)) // scale hits the max component
    }
  }

  test("sq8TopK: quantized cosine tracks exact cosine; recall@5 high") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .as[(Long, Long, Double)].collect()
    val sq = Similarity.sq8TopK(emb, queries, 5)
      .as[(Long, Long, Double)].collect()
    assert(sq.length == bf.length)
    // int8 symmetric quantization of 64-dim unit-ish vectors: cosine
    // error is bounded by ~2/127 per side; measured max diff ~0.006
    val bfAll = Similarity.bruteForceTopK(emb, queries, 500)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    sq.foreach { case (qid, nid, cq8) =>
      assert(math.abs(cq8 - bfAll((qid, nid))) <= 0.02,
        s"quantization drift for ($qid,$nid): $cq8 vs ${bfAll((qid, nid))}")
    }
    val truth = bf.map(r => (r._1, r._2)).toSet
    val got = sq.map(r => (r._1, r._2)).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.8, f"sq8 recall@5 $recall%.3f")
  }
}
