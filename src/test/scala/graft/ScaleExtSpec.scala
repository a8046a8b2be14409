package graft

import graft.ops.Graph
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-4 widening batch (QueriesScaleExt): BFS, KMV set algebra,
  * reaggregation, Z-order, bigram LM scoring, containment. The DuckDB
  * oracle is the primary gate for each; these specs pin the algebraic
  * properties the oracle can't express (error bounds, span bounds,
  * partition-order independence).
  */
class ScaleExtSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = Registry.byName(name).fn(spark, sf)

  test("boundedBfs: hop distances on a path graph, hops cap respected") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val d3 = Graph.boundedBfs(e, "src", "dst", seeds, hops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 unreached
    val d0 = Graph.boundedBfs(e, "src", "dst", seeds, hops = 0)
      .as[(Long, Long)].collect().toMap
    assert(d0 == Map(1L -> 0L))
  }

  test("boundedBfs: multi-seed takes the minimum distance") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("id")
    val d = Graph.boundedBfs(e, "src", "dst", seeds, hops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d(3L) == 1L) // via 10, not the 2-hop path via 1
  }

  test("boundedBfs is partition-order-independent") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").limit(2000)
    val e = li.withColumnRenamed("l_partkey", "src")
      .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
      .where(col("src") =!= col("dst"))
      .select("src", "dst")
    val seeds = e.select(col("src").as("id")).where(col("id") % 97 === 0)
    val a = Graph.boundedBfs(e, "src", "dst", seeds, 2)
      .as[(Long, Long)].collect().toSet
    val b = Graph.boundedBfs(e.repartition(7), "src", "dst", seeds, 2)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("q150: KMV estimates land within 4 sigma of the exact counts") {
    val r = run("q150_kmv_setops").collect().head
    val (estEn, estDe, estU) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val (exEn, exDe, exU) = (r.getLong(5), r.getLong(6), r.getLong(7))
    // k=64: relative sigma ~ 1/sqrt(k-2) ~ 12.7%; 4-sigma ~ 51%
    def ok(est: Double, exact: Long) =
      math.abs(est - exact) <= 0.51 * exact
    assert(ok(estEn, exEn), s"en: $estEn vs $exEn")
    assert(ok(estDe, exDe), s"de: $estDe vs $exDe")
    assert(ok(estU, exU), s"union: $estU vs $exU")
    // sketch-algebra sanity: union estimate >= each side's, and the
    // intersection estimate can't exceed the union's
    assert(r.getDouble(4) <= estU + 1e-9)
  }

  test("q151: merged monthly stats equal the direct computation exactly") {
    val p = col("o_totalprice").cast("decimal(18,2)")
    val direct = Tables.orders(spark, sf)
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        round(sum(p).cast("double") / count(lit(1)).cast("double"), 6).as("mean_price"))
      .select("month", "n_orders", "mean_price")
    val merged = run("q151_reaggregation").select("month", "n_orders", "mean_price")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("q152: every Z-range bucket bounds BOTH dimensions to a 64-wide span") {
    val rows = run("q152_zorder_layout").collect()
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      // bucket = z div 4096 fixes the top 2 bits of each 8-bit dim
      assert(maxX - minX <= 63, s"x span ${maxX - minX} in bucket ${r.getLong(0)}")
      assert(maxY - minY <= 63, s"y span ${maxY - minY} in bucket ${r.getLong(0)}")
    }
  }

  test("q153: bigram NLL is non-negative and zero only for deterministic sequences") {
    val rows = run("q153_bigram_score")
      .select("n_bigrams", "bigram_nll").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, nll) =>
      assert(n >= 1)
      assert(nll >= 0.0, s"negative NLL $nll")
    }
  }

  test("q155: exact-sum OLS agrees with Spark's native regr_slope") {
    // the native aggregate accumulates doubles in partition order — fine
    // as a 3-decimal sanity bound, not as the oracle
    val ours = run("q155_group_regression")
      .select("s_nationkey", "slope").as[(Long, Double)].collect().toMap
    val native = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("sl"))
      .as[(Long, Double)].collect().toMap
    assert(ours.nonEmpty && ours.keySet == native.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - native(k)) < 1e-3, s"nation $k: $v vs ${native(k)}")
    }
    run("q155_group_regression").select("r2").as[Double].collect()
      .foreach(r2 => assert(r2 >= 0.0 && r2 <= 1.0))
  }

  test("q156: count-of-counts Gini equals the direct sorted-rank formula") {
    val counts = Tables.lineitem(spark, sf).groupBy("l_partkey")
      .agg(count(lit(1)).as("c")).select("c").as[Long].collect().sorted
    val n = counts.length.toLong
    val total = counts.sum
    val rankSum = counts.zipWithIndex.map { case (c, i) => c * (i + 1L) }.sum
    val direct = 2.0 * rankSum / (n.toDouble * total.toDouble) -
      (n + 1L).toDouble / n.toDouble
    val row = run("q156_skew_audit").collect().head
    assert(math.abs(row.getAs[Double]("gini") - direct) < 1e-6)
    assert(row.getAs[Long]("p50_count") <= row.getAs[Long]("p99_count"))
    assert(row.getAs[Long]("p99_count") <= row.getAs[Long]("max_count"))
    assert(row.getAs[Long]("n_keys") == n && row.getAs[Long]("total_rows") == total)
  }

  test("q157: attributed credit conserves every purchase's cents exactly") {
    val ev = Tables.events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"),
        round(col("value") * 100).cast("bigint").as("cents"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val attributed = p.join(c, Seq("user_id"))
      .where(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 3 DAYS"))
      .select("p_id", "cents").distinct()
      .agg(sum("cents")).as[Long].collect().head
    val credited = run("q157_attribution")
      .agg(sum("credit_cents")).as[Long].collect().head
    assert(credited == attributed, s"$credited != $attributed — pennies leaked")
  }

  test("q158: majority vote is consistent and bounded by k=3") {
    val rows = run("q158_knn_label_check").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1 && votes <= 3)
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[Long]("knn_label") == r.getAs[Int]("own_label").toLong))
    }
  }

  test("q159: frame plan caps at maxFrames and spaces offsets by everySec") {
    val rows = run("q159_frame_plan")
      .select("p_partkey", "frame_offset_sec").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, offs) =>
      assert(offs.length <= 5, s"part $k planned ${offs.length} frames")
      offs.map(_._2).sorted.zipWithIndex.foreach { case (o, i) =>
        assert(math.abs(o - i * 0.002) < 1e-12, s"offset $o at index $i")
      }
    }
  }

  test("q160/q161: format round trips preserve row counts and schemas") {
    val csv = run("q160_csv_roundtrip")
    val src = Tables.lineitem(spark, sf).where(col("l_orderkey") % 100 === 0)
    assert(csv.count() == src.count())
    assert(csv.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate")
        .schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val orc = run("q161_orc_roundtrip")
    assert(orc.count() ==
      Tables.orders(spark, sf).where(col("o_orderkey") % 100 === 0).count())
  }

  test("q154: containment pairs are a superset signal of high-Jaccard pairs") {
    val cont = run("q154_shingle_containment")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val jac = run("q43_ngram_jaccard")
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Jaccard >= 0.5 forces both containments >= 0.5; the reverse
    // (quote/subset duplication) is what containment adds
    assert(jac.subsetOf(cont))
    val vals = run("q154_shingle_containment")
      .select("cont_in_a", "cont_in_b").as[(Double, Double)].collect()
    vals.foreach { case (a, b) =>
      assert(a > 0 && a <= 1.0 + 1e-9 && b > 0 && b <= 1.0 + 1e-9)
      assert(math.max(a, b) >= 0.5)
    }
  }
}
