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

  // directed DAG: 4 has in-edges but no out-edges (dangling sink),
  // 5 is a pure source, 1→2→3 chains into the sink
  private val dag = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 4L))

  test("pageRankRedistributed matches a sequential reference on a dangling DAG") {
    val got = Graph.pageRankRedistributed(dag.toDF("src", "dst"), "src", "dst",
        iters = 3)
      .as[(Long, Long)].collect().toMap

    // driver-side replay of the same BIGINT floor-division arithmetic
    val nodes = dag.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val out = dag.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contribs = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s0, ds) <- out; d0 <- ds) contribs(d0) += r(s0) / ds.size
      val dsum = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(n =>
        n -> (150000L + (85L * (contribs(n) + dsum / nodes.size)) / 100L)).toMap
    }
    assert(got == r, s"got $got, expected $r")
    // with decay-only treatment node 5 (no in-edges) would sit at the
    // base value; redistribution lifts it by the dangling share
    assert(got(5L) > 150000L)
  }

  test("pageRankRedistributed equals pageRank when no node is dangling") {
    val sym = (dag ++ dag.map(t => (t._2, t._1))).toDF("src", "dst")
    val plain = Graph.pageRank(sym, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val redis = Graph.pageRankRedistributed(sym, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(plain == redis)
  }

  test("frontierOnly BFS equals the full re-aggregation shape") {
    // deterministic pseudo-random digraph: 200 nodes, 600 edges; hop
    // bound past the diameter so late rounds run with an EMPTY frontier
    // (exercises the anti-join/no-new-nodes path)
    val edges = spark.range(0, 600).select(
      (col("id") * 37 % 200).as("src"), ((col("id") * 91 + 13) % 200).as("dst"))
    val seeds = spark.range(0, 3).select((col("id") * 50).as("id"))
    val full = Graph.boundedBfs(edges, "src", "dst", seeds, hops = 8)
    val fron = Graph.boundedBfs(edges, "src", "dst", seeds, hops = 8,
      frontierOnly = true)
    assert(full.except(fron).count() == 0 && fron.except(full).count() == 0)
    assert(full.count() == fron.count())
  }
}

class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kCore: survivor whose last peel removed every neighbor is kept at degree 0") {
    // star: the center has degree 3 >= k=2, every spoke has degree 1 —
    // one round peels all spokes, leaving the center with an empty
    // induced neighborhood. The output must still contain it.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.kCore(e, "src", "dst", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L))
  }

  test("kCore: triangle is a stable 2-core with exact degrees") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.kCore(e, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("basketPairs: mega-basket above the cap contributes no pairs") {
    // basket 100 has 5 items (25 pairs if unguarded), basket 200 has 2
    val rows = (1L to 5L).map(i => (100L, i)) :+ (200L, 1L) :+ (200L, 2L)
    val op = rows.toDF("ok", "pk")
    val capped = Relational.basketPairs(op, "ok", "pk", maxBasket = 4)
      .as[(Long, Long, Long)].collect()
    assert(capped.toSet == Set((1L, 2L, 1L)))
    val full = Relational.basketPairs(op, "ok", "pk", maxBasket = 0)
      .as[(Long, Long, Long)].collect()
    assert(full.length == 10) // C(5,2); (1,2) merges across the baskets
    assert(full.map(r => (r._1, r._2) -> r._3).toMap.apply((1L, 2L)) == 2L)
  }

  test("repetitionSignals: exact integer gram accounting") {
    // "a b a b c": bigrams (a b), (b a), (a b), (b c) -> 4 total,
    // 3 distinct, top count 2
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = graft.ops.Text.repetitionSignals(df, "doc_id", "text", 2)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(r == ((1L, 4L, 3L, 2L, 0.5, 0.25)))
  }

  test("chunkTokens: strided windows cover every token, last chunk ragged") {
    val df = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = graft.ops.Text.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .select("chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L), (3L, 10L, 1L)))
  }

  test("dedupSurvivorsBy: keeps the highest-preference member, ties to smallest id") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "quality")
    // one group {1,2,3}; doc 4 was never a candidate
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "group_id")
    val s = graft.ops.Dedup.dedupSurvivorsBy(docs, "doc_id", groups, "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(s == Set(2L, 4L)) // 2 beats 3 on the id tie-break, 1 on quality
  }

  test("layoutEdges(reliable): the laid-out frame survives losing every parent block") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val src = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("src", "dst")
      .persist()
    src.count()
    val laid = Graph.layoutEdges(src, "src", "dst", reliable = true)
    // simulate executor-storage loss: drop the parent's blocks AND any
    // block storage behind the laid-out frame itself (Checkpoints.free
    // is documented as a no-op for reliable frames — data lives in the
    // checkpoint directory, not the block manager). A localCheckpoint
    // lineage would be unrecoverable after this.
    src.unpersist(true)
    graft.ops.Checkpoints.free(laid)
    assert(laid.as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 3L)))
  }

  test("segmentDedup: boilerplate segment struck from every doc, order kept") {
    // 2-token segments; "x y" appears in all 3 docs (cap 2) -> dropped;
    // doc 3 is nothing but boilerplate -> survives empty; doc 4 empty
    val docs = Seq(
      (1L, "x y a b c d"), (2L, "p q x y r s"),
      (3L, "x y x y"), (4L, "")).toDF("doc_id", "text")
    val r = graft.ops.Dedup.segmentDedup(docs, "doc_id", "text",
        segTokens = 2, maxDocs = 2)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == ((3L, 2L, 1L, m("a b c d"))))
    assert(r(2L) == ((3L, 2L, 1L, m("p q r s"))))
    assert(r(3L) == ((2L, 0L, 2L, m(""))))  // shredded, not deleted
    assert(r(4L) == ((0L, 0L, 0L, m(""))))  // empty in, empty out
  }

  test("domainPercentileGate: integer percentile_disc threshold per domain") {
    val df = Seq(("en", 1L, 10L), ("en", 2L, 20L), ("en", 3L, 30L), ("en", 4L, 40L),
      ("fr", 5L, 100L), ("fr", 6L, 200L)).toDF("lang", "id", "score")
    // en: ceil(4*50/100)=2nd score asc -> thr 20; fr: ceil(2*50/100)=1st -> 100
    val r = graft.ops.Text.domainPercentileGate(df, "lang", "score", 50)
      .select("id").as[Long].collect().toSet
    assert(r == Set(2L, 3L, 4L, 5L, 6L))
    // pct=0 keeps everything
    val all = graft.ops.Text.domainPercentileGate(df, "lang", "score", 0)
      .count()
    assert(all == 6L)
  }

  test("hardNegatives: same-label vectors never appear") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 1), (4L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ops.Similarity.hardNegatives(
        emb, emb.where($"vec_id" === 1), k = 2)
      .select("neighbor_id", "neighbor_label")
      .as[(Long, Int)].collect()
    assert(r.forall(_._2 == 1))             // only cross-label
    assert(r.map(_._1).toSet == Set(3L, 4L)) // nearest different-label first
  }

  test("fillQuota: exclusive-cumsum admission — bounded overshoot, never empty") {
    val docs = (1L to 20L).map(i => ("a", i, 10L)) ++
      (21L to 24L).map(i => ("b", i, 100L))
    val df = docs.toDF("dom", "id", "cost")
    val quotas = Seq(("a", 35L), ("b", 1L)).toDF("dom", "quota")
    val r = graft.ops.Sampling.fillQuota(df, Seq("dom"), "id", "cost", quotas)
      .as[(String, Long, Long)].collect()
    val byDom = r.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // a: exclusive cumsum < 35 admits exactly ceil(35/10)=4 rows (40)
    assert(byDom("a") == 40L)
    // b: quota 1 still admits exactly one 100-cost row
    assert(byDom("b") == 100L)
    // deterministic: md5 layout replays identically
    val r2 = graft.ops.Sampling.fillQuota(df.repartition(7), Seq("dom"),
      "id", "cost", quotas).as[(String, Long, Long)].collect()
    assert(r.toSet == r2.toSet)
  }

  test("allocateBudget: quotas sum to the budget, remainder by largest fraction") {
    // weights 5/3/2 over budget 7: floors 3/2/1 (sum 6), remainders
    // 5/1/4 -> the single leftover unit goes to key a (largest rem)
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("dom", "weight")
    val r = graft.ops.Sampling.allocateBudget(w, Seq("dom"), "weight", 7L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(r == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(r.values.sum == 7L)
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

/** Round-6 graph-loop shape pins: the broadcast-hinted loop and the
  * shuffle-join fallback must agree bit-for-bit (integer arithmetic
  * makes that checkable with plain equality), and the hinted round
  * must actually be exchange-free over the laid-out edge cache.
  */
class GraphShapeSpec extends SparkSpec {
  import spark.implicits._

  private val edges = (for {
    i <- 0L until 40L
    j <- Seq((i * 7 + 3) % 40, (i * 11 + 5) % 40) if j != i
  } yield (i, j)).toDF("src", "dst")

  // a zero row bound forces every round into the above-the-gate
  // shuffle-join regime — the path a too-big-to-broadcast O(|V|)
  // frame takes at corpus scale
  test("pageRank: above-the-gate shuffle regime matches the hinted shape exactly") {
    val a = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges, "src", "dst", iters = 3,
      broadcastRankRows = 0L).as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("boundedBfs: above-the-gate shuffle regime matches the hinted shape exactly") {
    val seeds = Seq(0L, 13L).toDF("id")
    val a = Graph.boundedBfs(edges, "src", "dst", seeds, hops = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.boundedBfs(edges, "src", "dst", seeds, hops = 3,
      broadcastFrontierRows = 0L).as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("kCore: above-the-gate shuffle regime matches the hinted shape exactly") {
    val a = Graph.kCore(edges, "src", "dst", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graph.kCore(edges, "src", "dst", k = 2, rounds = 2,
      broadcastAliveRows = 0L).as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation/weightedSssp/hits: shuffle regime matches hinted") {
    val lpA = Graph.labelPropagation(edges, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    val lpB = Graph.labelPropagation(edges, "src", "dst", rounds = 2,
      broadcastLabelRows = 0L).as[(Long, Long)].collect().toMap
    assert(lpA == lpB && lpA.nonEmpty)
    val we = edges.withColumn("w", (col("src") % 5 + 1).cast("long"))
    val seeds = Seq(0L, 13L).toDF("id")
    val ssA = Graph.weightedSssp(we, "src", "dst", "w", seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val ssB = Graph.weightedSssp(we, "src", "dst", "w", seeds, rounds = 3,
      broadcastDistRows = 0L).as[(Long, Long)].collect().toMap
    assert(ssA == ssB && ssA.nonEmpty)
    val hA = Graph.hits(edges, "src", "dst", iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val hB = Graph.hits(edges, "src", "dst", iters = 2,
      broadcastRankRows = 0L).as[(Long, Long, Long)].collect().toSet
    assert(hA == hB && hA.nonEmpty)
  }

  test("seededBfsBitmask equals seededBfs row form (any gate regime)") {
    import org.apache.spark.sql.functions.{expr => sexpr}
    val seeds = Seq((0L, 0), (13L, 1), (27L, 2)).toDF("id", "bit")
    val rowForm = Graph.seededBfs(edges, "src", "dst",
      seeds.select("id"), hops = 3)
      .as[(Long, Long, Long)].collect().toSet // (seed, id, dist)
    for (gate <- Seq(5000000L, 0L)) {
      val reach = Graph.seededBfsBitmask(edges, "src", "dst", seeds,
        hops = 3, broadcastMaskRows = gate)
      val got = reach
        .join(seeds.select(col("id").as("seed"), col("bit")),
          sexpr("((new_mask >> bit) & 1) = 1"))
        .select(col("seed"), col("id"), col("round").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === rowForm && got.nonEmpty, s"gate=$gate")
    }
  }

  test("no unconditional O(|V|) broadcast remains in Graph.scala") {
    // the r8 verdict's family-level defect: every broadcast of a frame
    // that scales with |V| must sit behind a row-count gate. Enforce
    // lexically: Graph.scala may mention `broadcast(` only on gated
    // paths (inside an if/else on a *Rows bound or a useBroadcast/hint
    // value derived from one) or on provably O(1) frames (the scalar
    // dsum/nCnt/mx cross-join rows).
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ops/Graph.scala")),
      "UTF-8")
    assert(!src.contains(": Boolean = true"),
      "boolean broadcast flags must be row-count gates")
  }

  test("hinted PageRank round over the dst layout runs with zero shuffle exchanges") {
    // mirrors one loop round (tools/PlanProbe): edges laid out on dst,
    // the O(V) frames broadcast-hinted. The executed plan must contain
    // BroadcastExchange only — an 'Exchange hashpartitioning' means
    // the O(E) frame re-shuffled and the layout stopped paying
    val e = Graph.layoutEdges(edges, "src", "dst", layoutKey = "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .localCheckpoint()
    val ranks = nodes.withColumn("rank_micro", lit(1000000L))
    val perSrc = ranks.where(col("__deg").isNotNull)
      .select(col("id").as("src"), expr("rank_micro div __deg").as("__c"))
    val sums = e.join(broadcast(perSrc), "src")
      .select(col("dst").as("id"), col("__c"))
      .groupBy("id").agg(sum(col("__c")).as("__s"))
    val next = nodes.join(broadcast(sums), Seq("id"), "left")
      .select(col("id"),
        (lit(150000L) + expr("(85 * coalesce(__s, 0L)) div 100"))
          .as("rank_micro"))
    next.count()
    // walk the plan TREE, not its text: the cached layout's
    // InMemoryRelation prints its one-time build (which rightly has
    // the single layout Exchange) but contributes no exec nodes
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = next.queryExecution.sparkPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, plan.toString.take(3000))
    // sparkPlan predates exchange insertion, so the broadcast shows as
    // the join strategy itself
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString.take(3000))
    e.unpersist(true)
  }
}
