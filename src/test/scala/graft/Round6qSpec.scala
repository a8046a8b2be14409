package graft

import org.apache.spark.sql.functions._

/** Round-6q operators plus plan-shape pins for the late round-6
  * batches. */
class Round6qSpec extends SparkSpec {

  test("q279 upsampling: copies bracket the rate and mass lands near quota") {
    val out = graft.queries.Registry.byName("q279_deterministic_upsample")
      .fn(spark, sf)
    // floor(rate) <= copies <= floor(rate) + 1, always
    assert(out.where(col("n_copies") < expr("rate_ppm div 1000000") ||
      col("n_copies") > expr("rate_ppm div 1000000") + 1).count() == 0)
    // per-source emitted copy mass approximates rate * n_docs: the
    // fractional draws are md5-uniform, so the deterministic total sits
    // within a loose band of the expectation (exactness is the oracle's
    // job — this pins the estimator is not systematically biased)
    val bad = out.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_copies").as("emitted"),
        first("rate_ppm").as("rp"))
      .where(abs(col("emitted") * 1000000 - col("rp") * col("n")) >
        col("n") * lit(500000L))
      .count()
    assert(bad == 0)
  }

  test("q280 rebalance plan conserves mass: targets sum to total, surpluses to zero") {
    val out = graft.queries.Registry.byName("q280_shard_balance_plan")
      .fn(spark, sf)
    val r = out.agg(sum("size").as("sz"), sum("target").as("tg"),
      sum("surplus").as("sp"), max(abs(col("surplus"))).as("mx")).collect()(0)
    assert(r.getAs[Long]("sz") == r.getAs[Long]("tg"))
    assert(r.getAs[Long]("sp") == 0L)
    // largest-remainder targets differ by at most 1 from each other
    val t = out.agg((max("target") - min("target")).as("spread"))
      .collect()(0).getAs[Long]("spread")
    assert(t <= 1L)
  }

  test("late-batch plans stay cartesian-free and broadcast where promised") {
    def plan(name: String): String = graft.queries.Registry.byName(name)
      .fn(spark, sf).queryExecution.executedPlan.toString
    // q266: per-term totals broadcast into the tf frame
    val p266 = plan("q266_ctfidf_terms")
    assert(p266.contains("BroadcastHashJoin"), p266.take(1500))
    assert(!p266.contains("CartesianProduct"))
    // q271: source overlap joins on tok (equi), never doc x doc
    val p271 = plan("q271_source_overlap")
    assert(!p271.contains("CartesianProduct"))
    // q273: lexical stage prunes via TakeOrderedAndProject, probe is
    // a broadcast — the corpus never sorts globally
    val p273 = plan("q273_retrieval_cascade")
    assert(p273.contains("TakeOrderedAndProject"), p273.take(1500))
    assert(p273.contains("BroadcastExchange"))
    // q277: the only nested-loop is the bounded 4-row probe broadcast
    val p277 = plan("q277_maxsim_late_interaction")
    assert(!p277.contains("CartesianProduct"))
    assert(p277.contains("BroadcastNestedLoopJoin") ||
      p277.contains("BroadcastExchange"))
    // q280: windows run over the O(shards) frame after the corpus agg
    val p280 = plan("q280_shard_balance_plan")
    assert(p280.contains("HashAggregate"))
  }
}
