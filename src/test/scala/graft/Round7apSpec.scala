package graft

import org.apache.spark.sql.functions._

/** Round-7ap pins: Borůvka's forest equals driver-side Kruskal on the
  * same unique-keyed graph (an independent algorithm — greedy global
  * sort vs per-component contraction), and satisfies the structural
  * forest laws.
  */
class Round7apSpec extends SparkSpec {

  test("q419: Borůvka output equals Kruskal's MSF, and is a forest") {
    val rows = graft.queries.Registry.byName("q419_boruvka_msf")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rebuild the same edge universe driver-side
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val edges = li
      .join(li.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .where(col("l_partkey") < col("p2"))
      .select(col("l_partkey").as("src"), col("p2").as("dst"))
      .distinct() // (order, pair) distinct then pair-count
    val cnt = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey").as("p2")), "l_orderkey")
      .where(col("l_partkey") < col("p2"))
      .select("l_orderkey", "l_partkey", "p2").distinct()
      .groupBy(col("l_partkey").as("src"), col("p2").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cnt.nonEmpty)
    // Kruskal on key order (unique total order — same as the query's)
    val sorted = cnt.map { case (s, d, c) =>
      val key = (1000000L - c) * (1L << 40) + s * (1L << 20) + d
      (key, s, d, c)
    }.sortBy(_._1)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = sorted.flatMap { case (_, s, d, c) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) { parent(rs) = rd; Some((s, d, c)) } else None
    }
    assert(rows.toSet == kruskal.toSet,
      s"boruvka=${rows.length} kruskal=${kruskal.length} " +
        s"onlyB=${(rows.toSet -- kruskal.toSet).take(3)} " +
        s"onlyK=${(kruskal.toSet -- rows.toSet).take(3)}")
    // forest law: |edges| = |V| - |components|
    val vs = cnt.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = vs.map(find).distinct
    assert(rows.length == vs.length - comps.length)
    assert(edges.count() >= rows.length)
  }

  test("boruvkaMsf: single-task and shuffled label paths are identical") {
    // same co-purchase graph, the size knob forced both ways — the
    // bounded in-memory propagation must equal the groupBy-min loop
    // bit-for-bit (same recurrence, same iteration count)
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val e = li
      .join(li.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .where(col("l_partkey") < col("p2"))
      .select("l_orderkey", "l_partkey", "p2").distinct()
      .groupBy(col("l_partkey").as("src"), col("p2").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("src"), col("dst"),
        ((lit(1000000L) - col("cnt")) * lit(1L << 40)
          + col("src") * lit(1L << 20) + col("dst")).as("key"))
      .localCheckpoint()
    val fast = graft.ops.Graph.boruvkaMsf(e)
      .collect().map(_.getLong(0)).toSet
    val shuffled = graft.ops.Graph.boruvkaMsf(e, singleTaskLabelEdges = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(fast.nonEmpty && fast == shuffled)
  }
}
