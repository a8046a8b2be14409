package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing operators for
  * training-data pipelines. The reference pins reproducibility via
  * id-skip idempotence (inputs/youtube_audio_extractor.py:47); at
  * engine scale the same property — "membership is a pure function of
  * the record, never of the run" — is what makes splits stable across
  * reruns, incremental loads, and cluster sizes.
  *
  * All randomness is md5-hash-derived (engine-portable, oracle-
  * verifiable): the first 8 hex chars of md5(id) interpreted as a
  * 32-bit integer give a uniform bucket. No RNG, no seed plumbing, no
  * driver state — each operator is a pure narrow map (plus at most one
  * broadcast join), so it scales embarrassingly.
  */
object Sampling {

  /** Uniform 32-bit hash of a column: first 8 hex chars of
    * md5(string(c)) as a long in [0, 2^32). */
  def hashLong(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic uniform bucket in [0, n). */
  def hashBucket(c: Column, n: Int): Column = hashLong(c) % n

  /** Train/val/test split: adds a `split` column. Percentages are out
    * of 100; the remainder is `test`. Membership depends only on the
    * id value, so adding rows never reshuffles existing assignments. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Balanced stratified downsample: keep ~`target` rows per stratum,
    * deterministically. The per-stratum keep-fraction is derived from
    * observed counts (one hash-agg), broadcast back (strata are few by
    * definition), and applied as a pure filter — no sort, no shuffle
    * of the data itself. Thresholds are integers out of 10000 so the
    * boundary is exact and portable. */
  def balancedSample(df: DataFrame, stratumCol: String, idCol: String,
                     target: Long): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__cnt"))
    val thresh = least(lit(10000L),
      floor(lit(10000.0) * target / col("__cnt")).cast("long"))
    df.join(broadcast(counts), Seq(stratumCol))
      .where(hashBucket(col(idCol), 10000) < thresh)
      .drop("__cnt")
  }

  /** Weighted source mixing: keep each row with its stratum's rate
    * (default for unlisted strata). The training-mixture op — "100% of
    * wiki, 25% of crawl" — as a stateless filter. Rates are fixed at
    * plan time, so this composes with incremental ingestion: the same
    * row always makes the same choice. */
  def weightedMix(df: DataFrame, stratumCol: String, idCol: String,
                  rates: Map[String, Double], default: Double): DataFrame = {
    // round, don't truncate: 0.29 * 10000 is 2899.999... in double and
    // .toLong would shave a bucket off the intended exact threshold
    val thresh = rates.foldLeft(lit(math.round(default * 10000))) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(math.round(v * 10000))).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), 10000) < thresh)
  }

  /** Largest-remainder budget apportionment — the training-mixture
    * planner: split an integer token `budget` across domains in
    * proportion to integer `weightCol`, exactly. Each domain gets
    * floor(budget * w / W); the unassigned remainder (< #domains) goes
    * one unit at a time to the domains with the largest fractional
    * remainder (ties → key order). Pure BIGINT arithmetic, so the
    * allocation is bit-identical on any engine and Σ quota == budget
    * by construction — the property a mixture manifest needs before a
    * 100 TB sampling job fans out (DoReMi-style reweighting, temperature
    * sampling, and manual mixtures all reduce to this final step once
    * weights are chosen). Requires budget * max(w) < 2^63.
    *
    * The remainder ranking is one global window over the DOMAIN table
    * — rows here are mixture entries (a handful to a few thousand),
    * never data rows, the same domain-bounded-window discipline as
    * `Layout.binPack`. The two scalars (total weight, leftover) ride
    * broadcast one-row frames. */
  def allocateBudget(weights: DataFrame, keyCols: Seq[String],
                     weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    val tot = weights.agg(sum(col(weightCol)).cast("long").as("__W"))
    val q = weights.crossJoin(broadcast(tot))
      .select(keyCols.map(col) ++ Seq(col(weightCol),
        expr(s"($budget * $weightCol) div __W").as("__fq"),
        expr(s"($budget * $weightCol) % __W").as("__rem")): _*)
    val left = q.agg((lit(budget) - sum("__fq")).cast("long").as("__left"))
    val rankW = Window.orderBy(
      col("__rem").desc +: keyCols.map(col(_).asc): _*)
    q.crossJoin(broadcast(left))
      .withColumn("__rk", row_number().over(rankW))
      .select(keyCols.map(col) ++ Seq(col(weightCol),
        (col("__fq") + when(col("__rk") <= col("__left"), lit(1L))
          .otherwise(lit(0L))).as("quota")): _*)
  }

  /** Quota-filling sampler — the execution half of [[allocateBudget]]:
    * within each domain, lay rows out in a deterministic pseudo-random
    * order (md5 of the id — reshuffles run-to-run-identically on any
    * engine) and keep rows while the EXCLUSIVE running cost is under
    * the domain's quota, so each domain overshoots by at most one row
    * and a nonzero quota always admits at least one row. Plan + fill
    * together turn a mixture spec into the concrete training slice.
    *
    * `quotas` carries one row per domain (keyCols + `quota`) — the
    * planner's output, broadcast back onto the data. The running sum
    * is a per-domain window: domains fill in parallel, and within a
    * domain the window is the order the sample DEFINITION requires
    * (for domains too large for one partition's sort, pre-bucket by
    * md5 range and allocate per bucket — the same two-level discipline
    * as `twoLevelCumSum`). */
  def fillQuota(df: DataFrame, keyCols: Seq[String], idCol: String,
                costCol: String, quotas: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(broadcast(quotas), keyCols)
      .withColumn("__cum", coalesce(sum(col(costCol)).over(w), lit(0L)))
      .where(col("__cum") < col("quota"))
      .drop("__cum", "quota")
  }

  /** Concat-and-chunk sequence packing: lay documents end-to-end (in
    * id order) and cut every `budget` cost units — the standard LLM
    * pretraining packing. Emits each doc's byte/token offset, first
    * sequence index, and how many sequences it spans.
    *
    * Packing is computed independently within `nShards` hash-shards:
    * a single global running sum would serialize on one task, while
    * per-shard windows scale linearly with the cluster (each shard is
    * one partition of the window shuffle). Shard membership is
    * hash-of-id, so packing is reproducible run-to-run. */
  def packSequences(df: DataFrame, idCol: String, costCol: String,
                    budget: Long, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(costCol).cast("long").as("cost"),
        hashBucket(col(idCol), nShards).as("shard"))
      .withColumn("offset", coalesce(sum(col("cost")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"offset div ${budget}L"))
      .withColumn("n_seqs",
        expr(s"(offset + greatest(cost, 1L) - 1L) div ${budget}L") -
          col("seq_first") + lit(1L))
  }

  /** Deterministic weighted sample of k rows (A-ES / Efraimidis-
    * Spirakis): each row gets priority -ln(u)/w with u a deterministic
    * md5-uniform of the id in (0,1]; the k smallest priorities win.
    * Heavier weights get systematically smaller priorities — inclusion
    * probability proportional to weight — yet membership is a pure
    * function of (id, weight): reruns and cluster-size changes never
    * change the sample. Top-k by priority plans as
    * TakeOrderedAndProject — no global sort at scale. */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int): DataFrame = {
    // (hash + 1) / 2^32: u in (0, 1], never ln(0)
    val u = (hashLong(col(idCol)) + 1.0) / 4294967296.0
    val priority = -log(u) / col(weightCol).cast("double")
    df.where(col(weightCol) > 0)
      .withColumn("priority", round(priority, 8))
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
  }
}
