package graft

import graft.ops.{Dedup, Events, Relational, Sampling, Similarity, Text}
import org.apache.spark.sql.functions._

/** Invariant tests for the round-2 widening operators (q100-q109).
  * The value-level correctness lives in the DuckDB oracles; these pin
  * the semantic properties the oracle can't express directly.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("scd2History: intervals chain per key, delete closes without a row") {
    val ch = Seq(
      (1L, "upsert", 1L, "a"), (1L, "upsert", 3L, "b"), (1L, "delete", 5L, "b"),
      (2L, "upsert", 2L, "x"),
      (3L, "upsert", 1L, "p"), (3L, "delete", 2L, "p"), (3L, "upsert", 4L, "q"))
      .toDF("k", "op", "seq", "v")
    val h = Relational.scd2History(ch, "k", "op", "seq")
      .orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(h == Seq(
      (1L, "a", 1L, Some(3L), false),   // superseded by the seq-3 upsert
      (1L, "b", 3L, Some(5L), false),   // closed by the delete, no new row
      (2L, "x", 2L, None, true),
      (3L, "p", 1L, Some(2L), false),
      (3L, "q", 4L, None, true)))       // re-opened after a delete
  }

  test("snapshotDiff then applyChangelog reconstructs the new snapshot") {
    val old = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal")
    val k = col("c_custkey")
    val newSnap = old.where(k % 7 =!= 0)
      .select(when(k % 7 === 1, k + 500000).otherwise(k).as("c_custkey"),
        col("c_name"),
        when(k % 7 === 2, col("c_acctbal") * 2).otherwise(col("c_acctbal"))
          .as("c_acctbal"))
    val diff = Relational.snapshotDiff(old, newSnap, "c_custkey")
      // applyChangelog expects op in {upsert, delete} + a seq column
      .withColumn("op2", when(col("op") === "delete", "delete").otherwise("upsert"))
      .withColumn("seq", lit(1L)).drop("op").withColumnRenamed("op2", "op")
    val rebuilt = Relational.applyChangelog(old, diff, "c_custkey", "op", "seq")
    assert(rebuilt.exceptAll(newSnap).isEmpty && newSnap.exceptAll(rebuilt).isEmpty)
    // unchanged rows emit no change row
    val nChanged = old.where(k % 7 === 0 || k % 7 === 1 || k % 7 === 2).count() +
      newSnap.where(col("c_custkey") > 500000).count()
    assert(diff.count() == nChanged)
  }

  test("simhashNearDupPairs equals the brute-force pair set") {
    val docs = Tables.documents(spark, sf).limit(120).cache()
    val blocked = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fp = Dedup.simhash(docs, "doc_id", "text", nBits = 64)
    val a = fp.select(col("doc_id").as("id_a"), col("simhash").as("fa"))
    val b = fp.select(col("doc_id").as("id_b"), col("simhash").as("fb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .where(Dedup.hamming16(col("fa"), col("fb")) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == brute && brute.nonEmpty)
  }

  test("activeDayIslands: runs are maximal and consecutive") {
    val ev = Seq(
      (10L, "2024-01-01"), (10L, "2024-01-02"), (10L, "2024-01-02"),
      (10L, "2024-01-04"), (20L, "2024-01-10"))
      .toDF("user_id", "day")
      .select(col("user_id"), col("day").cast("timestamp").as("ts"))
    val runs = Events.activeDayIslands(ev, "user_id", "ts")
      .orderBy("user_id", "run_start")
      .select(col("user_id"), col("run_start").cast("string"),
        col("run_end").cast("string"), col("run_days"))
      .as[(Long, String, String, Long)].collect().toSeq
    assert(runs == Seq(
      (10L, "2024-01-01", "2024-01-02", 2L),
      (10L, "2024-01-04", "2024-01-04", 1L),
      (20L, "2024-01-10", "2024-01-10", 1L)))
  }

  test("profileColumns matches direct aggregates in one pass") {
    val orders = Tables.orders(spark, sf)
    val p = Relational.profileColumns(orders, Seq("o_orderstatus", "o_custkey"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect().toSeq
    val nCust = orders.select(countDistinct("o_custkey")).as[Long].head()
    val n = orders.count()
    assert(p.map(_._1) == Seq("o_custkey", "o_orderstatus"))
    assert(p.head._2 == n && p.head._3 == nCust)
    assert(p(1)._4 == "F" && p(1)._5 <= "P" || p(1)._5 == "P" || p(1)._5 == "O")
  }

  test("histogram preserves total count and respects bucket bounds") {
    val li = Tables.lineitem(spark, sf)
    val h = Relational.histogram(li, "l_extendedprice", 0.0, 120000.0, 12)
    assert(h.agg(sum("n")).as[Long].head() == li.count())
    val bad = h.where(col("bucket") < 0 || col("bucket") > 11).count()
    assert(bad == 0)
  }

  test("labelCentroids: n equals the label count, means are bounded") {
    val emb = Tables.embeddings(spark, sf)
    val c = Similarity.labelCentroids(emb, "label", "embedding", 4)
    val perLabel = emb.groupBy("label").count()
      .as[(Int, Long)].collect().toMap
    val rows = c.select(col("label").cast("int"), col("dim"), col("n"), col("mean"))
      .as[(Int, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lbl, dim, n, mean) =>
      assert(n == perLabel(lbl) && dim >= 1 && dim <= 4 && math.abs(mean) < 1e6)
    }
  }

  test("weightedTopK is deterministic and weight-sensitive") {
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.weightedTopK(docs, "doc_id", "n_chars", 20)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Sampling.weightedTopK(docs, "doc_id", "n_chars", 20)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2 && s1.size == 20)
    // constant weights reduce to a pure hash sample; boosting one id's
    // weight by 1e9 must pull it into the sample
    val flat = docs.withColumn("w", lit(1.0))
    val someId = docs.select(max("doc_id")).as[Long].head()
    val boosted = flat.withColumn("w",
      when(col("doc_id") === someId, lit(1e9)).otherwise(col("w")))
    val got = Sampling.weightedTopK(boosted, "doc_id", "w", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got.contains(someId))
  }

  test("adjacentPairFrequencies: total pairs = sum(max(len-1, 0))") {
    val docs = Tables.documents(spark, sf).limit(100).cache()
    val total = Text.adjacentPairFrequencies(docs, "text")
      .agg(sum("freq")).as[Long].head()
    val expected = docs
      .select(greatest(size(Text.subwordTokens(col("text"))) - 1, lit(0)).as("m"))
      .agg(sum("m")).as[Long].head()
    assert(total == expected && total > 0)
  }

  test("fuzzyPairsBlocked stays within blocks and the distance bound") {
    val parts = Tables.part(spark, sf)
    val pairs = Dedup.fuzzyPairsBlocked(parts, "p_partkey", "p_name",
      Seq("p_brand", "p_size"), 6)
    val byId = parts.select(col("p_partkey"), col("p_brand"), col("p_size"))
    val joined = pairs
      .join(byId.select(col("p_partkey").as("id_a"), col("p_brand").as("ba"),
        col("p_size").as("sa")), Seq("id_a"))
      .join(byId.select(col("p_partkey").as("id_b"), col("p_brand").as("bb"),
        col("p_size").as("sb")), Seq("id_b"))
    assert(joined.where(col("ba") =!= col("bb") || col("sa") =!= col("sb"))
      .count() == 0)
    assert(pairs.where(col("distance") > 6 || col("id_a") >= col("id_b"))
      .count() == 0)
  }
}
