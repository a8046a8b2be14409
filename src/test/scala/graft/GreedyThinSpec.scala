package graft

import graft.plans.GreedyThinOp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins for the custom LogicalPlan → SparkStrategy → SparkPlan lane
  * (plans/GreedyThin): semantics vs an independent sequential
  * reference, plan shape (one exchange, one sort, the custom exec),
  * tie semantics, and partitioning/ordering propagation (no second
  * exchange for a downstream per-key aggregate).
  */
class GreedyThinSpec extends SparkSpec {

  private val gap = 3600L * 1000000L // 1 hour in micros

  test("greedy thinning equals the sequential driver-side reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .where(col("ts").isNotNull)
    val got = GreedyThinOp
      .thin(ev, Seq("user_id"), "ts", Seq("event_id"), gap)
      .select("event_id").collect().map(_.getLong(0)).toSet

    // independent reference: per-user sequential greedy scan
    val rows = ev.select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(r => (r._2, r._3))
      var lastKept = Long.MinValue
      sorted.flatMap { case (_, t, id) =>
        if (lastKept == Long.MinValue || t >= lastKept + gap) {
          lastKept = t; Some(id)
        } else None
      }
    }.toSet
    assert(want.nonEmpty && got == want)
  }

  test("plan: GreedyThinExec with exactly one exchange and one sort") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val plan = GreedyThinOp.thin(ev, Seq("user_id"), "ts", Seq("event_id"), gap)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreedyThin"))
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Sort"), plan)
  }

  test("ties on ts: only the first row by tiebreak survives the gap") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 100L, 7L), Row(1L, 100L, 3L), // tie: id 3 kept, 7 dropped
        Row(1L, 104L, 4L),                    // < gap after 100: dropped
        Row(1L, 105L, 5L),                    // == 100+gap: kept
        Row(2L, 1L, 9L))), schema)            // new key: kept
    val got = GreedyThinOp.thin(df, Seq("k"), "t", Seq("id"), 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 5L, 9L))
  }

  test("bucketed+sorted input: thinning plans with ZERO exchanges and sorts") {
    // the 100 TB posture: a crawl table bucketed by key and sorted by
    // (key, ts, tiebreak) satisfies the exec's declared distribution
    // AND ordering — EnsureRequirements inserts nothing; thinning the
    // whole table is a pure scan
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    spark.sql("DROP TABLE IF EXISTS b_thin_events")
    // one file per bucket (single writer task) — the scan reports its
    // sort order only then; at warehouse scale this is the standard
    // compaction invariant for sorted-bucketed tables
    ev.repartition(1).write.format("parquet").bucketBy(4, "user_id")
      .sortBy("user_id", "ts", "event_id")
      .mode("overwrite").saveAsTable("b_thin_events")
    // Spark reports the sorted-bucket scan's ordering only under this
    // conf (one-file-per-bucket guarded since SPARK-28632); without it
    // the plan still has ZERO exchanges — only a cheap re-sort of
    // already-sorted partitions
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val thinned = GreedyThinOp.thin(spark.table("b_thin_events"),
        Seq("user_id"), "ts", Seq("event_id"), gap)
      val plan = thinned.queryExecution.executedPlan.toString
      assert(plan.contains("GreedyThin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan)
      // and the result is identical to the unbucketed path
      val viaBucket = thinned.select("event_id").collect()
        .map(_.getLong(0)).toSet
      val direct = GreedyThinOp.thin(ev, Seq("user_id"), "ts",
        Seq("event_id"), gap).select("event_id").collect()
        .map(_.getLong(0)).toSet
      assert(viaBucket == direct && viaBucket.nonEmpty)
    } finally {
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("property: random dense-tie inputs equal the sequential reference") {
    // adversarial shape for the exec's state machine: few keys, tiny
    // timestamp domain (dense ties), tiny gap — every boundary case
    // (tie at the kept ts, exact-gap landing, key change mid-partition)
    // occurs many times; seeds fixed so the pin is reproducible
    val rnd = new scala.util.Random(421)
    for (trial <- 1 to 5) {
      val gapT = 1L + rnd.nextInt(5)
      val rows = (1 to 400).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("t", LongType),
        StructField("id", LongType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 7),
        schema)
      val got = GreedyThinOp.thin(df, Seq("k"), "t", Seq("id"), gapT)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(r => (r._2, r._3))
        var last = Long.MinValue
        sorted.flatMap { case (_, t, id) =>
          if (last == Long.MinValue || t >= last + gapT) { last = t; Some(id) }
          else None
        }
      }.toSet
      assert(got == want, s"trial $trial gap $gapT")
    }
  }

  test("streaming twin (q421) equals the batch physical operator (q420) row-for-row") {
    val batch = graft.queries.Registry.byName("q420_greedy_thinning")
      .fn(spark, sf).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stream = graft.queries.Registry.byName("q421_streaming_thinning")
      .fn(spark, sf).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && batch == stream)
  }

  test("key-only filter pushes THROUGH the operator into the scan") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ts"),
        col("o_orderkey"))
    // written naively: thin everything, THEN ask for one customer
    val one = GreedyThinOp.thin(ev, Seq("o_custkey"), "ts",
        Seq("o_orderkey"), 30L * 86400L * 1000000L)
      .where(col("o_custkey") === 19)
    val plan = one.queryExecution.executedPlan.toString
    // the rule moved the predicate below GreedyThin; PhysicalOperation
    // then handed it to the parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,19)]")
      || plan.contains("EqualTo(o_custkey,19)"), plan)
    // and it commutes: equal to filtering first
    val direct = GreedyThinOp.thin(ev.where(col("o_custkey") === 19),
        Seq("o_custkey"), "ts", Seq("o_orderkey"), 30L * 86400L * 1000000L)
      .collect().map(_.getLong(2)).toSet
    assert(one.collect().map(_.getLong(2)).toSet == direct && direct.nonEmpty)
  }

  test("non-key filter is NOT pushed (it would change the kept set)") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val out = GreedyThinOp.thin(ev, Seq("user_id"), "ts", Seq("event_id"), gap)
      .where(col("event_id") % 2 === 0)
    val optimized = out.queryExecution.optimizedPlan.toString
    // Filter must sit ABOVE GreedyThin in the optimized plan
    assert(optimized.indexOf("Filter") < optimized.indexOf("GreedyThin"),
      optimized)
    // and equals thin-then-filter computed independently
    val want = GreedyThinOp.thin(ev, Seq("user_id"), "ts", Seq("event_id"), gap)
      .collect().map(_.getLong(2)).filter(_ % 2 == 0).toSet
    assert(out.collect().map(_.getLong(2)).toSet == want)
  }

  test("column pruning reaches THROUGH the operator to the scan's ReadSchema") {
    val dir = "/root/testdata/sf0.001"
    // a wide frame: thin on (o_custkey, ts, o_orderkey), project ONE column
    val wide = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("ts", col("o_orderdate").cast("timestamp"))
    val narrow = GreedyThinOp.thin(wide, Seq("o_custkey"), "ts",
        Seq("o_orderkey"), 30L * 86400L * 1000000L)
      .select("o_custkey")
    val plan = narrow.queryExecution.executedPlan.toString
    // the scan must read only the three operator inputs, not o_comment
    // & co (o_orderdate feeds the ts cast)
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("o_comment") && !plan.contains("o_totalprice"), plan)
    // result parity with the unpruned path
    val got = narrow.collect().map(_.getLong(0)).sorted
    val want = GreedyThinOp.thin(wide, Seq("o_custkey"), "ts",
        Seq("o_orderkey"), 30L * 86400L * 1000000L)
      .collect().map(_.getLong(1)).sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("composite (string, long) keys: variable-width key equality is exact") {
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("sec", LongType),
      StructField("t", LongType), StructField("id", LongType)))
    // "a"/1 vs "a"/2 vs "aa"/1: adjacent groups after the sort whose
    // UnsafeRow key bytes differ only in length or in the long half
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 1L, 10L, 1L), Row("a", 1L, 12L, 2L), // 12 < 10+5 dropped
        Row("a", 2L, 10L, 3L),                        // new key: kept
        Row("aa", 1L, 11L, 4L),                       // new key: kept
        Row("aa", 1L, 16L, 5L))), schema)             // == 11+5: kept
    val got = GreedyThinOp.thin(df, Seq("host", "sec"), "t", Seq("id"), 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 4L, 5L))
  }

  test("whole-stage codegen spans the thin node (no pipeline break)") {
    // the r7 gap: GreedyThinExec was an interpreted mapPartitions
    // filter between codegen'd stages. With CodegenSupport the node
    // prints with the `*(id)` whole-stage marker, and fallback=false
    // makes any generated-code compile error FAIL the test instead of
    // silently reverting to the interpreted path.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ev = Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("event_id"))
      val thinned = GreedyThinOp.thin(ev, Seq("user_id"), "ts",
        Seq("event_id"), gap)
      // execute FIRST: under AQE the WholeStageCodegen wrapping only
      // exists in the final plan; fallback=false above means a
      // generated-code compile error fails this collect
      val got = thinned.collect().map(_.getLong(2)).toSet
      val plan = thinned.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) GreedyThin""".r.findFirstIn(plan).isDefined, plan)
      val rows = ev.where(col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = rows.groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(r => (r._2, r._3))
        var lastKept = Long.MinValue
        sorted.flatMap { case (_, t, id) =>
          if (lastKept == Long.MinValue || t >= lastKept + gap) {
            lastKept = t; Some(id)
          } else None
        }
      }.toSet
      assert(want.nonEmpty && got == want)
      // composite string+long keys through the generated comparator too
      val schema = StructType(Seq(
        StructField("host", StringType), StructField("sec", LongType),
        StructField("t", LongType), StructField("id", LongType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("a", 1L, 10L, 1L), Row("a", 1L, 12L, 2L),
          Row("a", 2L, 10L, 3L), Row("aa", 1L, 11L, 4L),
          Row("aa", 1L, 16L, 5L))), schema)
      val s2 = GreedyThinOp.thin(df, Seq("host", "sec"), "t", Seq("id"), 5L)
      assert(s2.collect().map(_.getLong(3)).toSet == Set(1L, 3L, 4L, 5L))
      assert("""\*\(\d+\) GreedyThin""".r
        .findFirstIn(s2.queryExecution.executedPlan.toString).isDefined)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("adaptive per-key gap equals the sequential reference (through codegen)") {
    val rnd = new scala.util.Random(826)
    val rows = (1 to 600).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(60).toLong, i.toLong)
    }
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 5),
      schema)
      .withColumn("g", col("k") % 3 * 4 + 2) // per-key gaps 2, 6, 10
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = GreedyThinOp.thinAdaptive(df, Seq("k"), "t", Seq("id"), "g")
      val got = out.collect().map(_.getLong(2)).toSet
      assert("""\*\(\d+\) GreedyThin""".r
        .findFirstIn(out.queryExecution.executedPlan.toString).isDefined)
      val want = rows.groupBy(_._1).values.flatMap { grp =>
        val k = grp.head._1
        val gap = k % 3 * 4 + 2
        val sorted = grp.sortBy(r => (r._2, r._3))
        var last = Long.MinValue
        sorted.flatMap { case (_, t, id) =>
          if (last == Long.MinValue || t >= last + gap) { last = t; Some(id) }
          else None
        }
      }.toSet
      assert(got == want && want.nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("decimal-keyed thin runs through codegen and equals the reference") {
    // r8 verdict stretch: DecimalType keys now codegen (value-based
    // Decimal.equals, clone-on-group-change) instead of falling back
    val rnd = new scala.util.Random(98)
    val rows = (1 to 500).map { i =>
      (BigDecimal(rnd.nextInt(7)) / 100, rnd.nextInt(50).toLong, i.toLong)
    }
    val schema = StructType(Seq(
      StructField("price", DecimalType(12, 2)), StructField("t", LongType),
      StructField("id", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1.bigDecimal, r._2, r._3)), 5), schema)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = GreedyThinOp.thin(df, Seq("price"), "t", Seq("id"), 4L)
      val got = out.collect().map(_.getLong(2)).toSet
      assert("""\*\(\d+\) GreedyThin""".r
        .findFirstIn(out.queryExecution.executedPlan.toString).isDefined,
        out.queryExecution.executedPlan.toString)
      val want = rows.groupBy(_._1).values.flatMap { grp =>
        val sorted = grp.sortBy(r => (r._2, r._3))
        var last = Long.MinValue
        sorted.flatMap { case (_, t, id) =>
          if (last == Long.MinValue || t >= last + 4L) { last = t; Some(id) }
          else None
        }
      }.toSet
      assert(got == want && want.nonEmpty)
      // interpreted fallback (codegen off) must agree bit-for-bit
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = GreedyThinOp.thin(df, Seq("price"), "t", Seq("id"), 4L)
        .collect().map(_.getLong(2)).toSet
      assert(interp == want)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("AQE skew handling never violates the operator's ClusteredDistribution") {
    // the r7 stretch item: a deliberately skewed key under AQE. AQE's
    // skew machinery can SPLIT a partition only inside its skew-join
    // rule; the coalescing it applies to a plain ENSURE_REQUIREMENTS
    // exchange merges whole hash partitions and can never send one
    // key to two tasks — so the thin node's per-partition state
    // machine stays sound. The detector is the semantics itself: if a
    // hot key were ever split, each fragment would re-keep its own
    // "first row" and the kept count for that key would exceed the
    // sequential reference's.
    val hot = (1 to 40000).map(i => (7L, (i * 13L) % 100000L, i.toLong))
    val cold = (1 to 500).map(i => ((i % 50 + 100).toLong, i.toLong * 3L, (50000 + i).toLong))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("id", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((hot ++ cold).map(r => Row(r._1, r._2, r._3)), 13),
      schema)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val thinned = GreedyThinOp.thin(df, Seq("k"), "t", Seq("id"), 17L)
      val got = thinned.collect().map(r => (r.getLong(0), r.getLong(2)))
      val want = (hot ++ cold).groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(r => (r._2, r._3))
        var last = Long.MinValue
        sorted.flatMap { case (k, t, id) =>
          if (last == Long.MinValue || t >= last + 17L) { last = t; Some((k, id)) }
          else None
        }
      }.toSet
      assert(got.length == got.toSet.size) // no fragment double-keeps
      assert(got.toSet == want)
      // and AQE actually re-planned the exchange (final adaptive plan)
      val plan = thinned.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan)
      assert(plan.contains("GreedyThin"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("output partitioning survives: downstream per-key agg adds no exchange") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val agg = GreedyThinOp.thin(ev, Seq("user_id"), "ts", Seq("event_id"), gap)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
