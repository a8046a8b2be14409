package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (id-pair DataFrames) — the shapes a
  * corpus-curation pipeline needs beyond connected components
  * (`Dedup.duplicateGroups`/`starContractionGroups`) and triangle
  * counting (`Dedup.triangleCount`): link-analysis scoring of a
  * citation/co-occurrence graph to weight or filter documents.
  *
  * Everything here is iterative-join Spark with the same discipline as
  * the CC operators: `localCheckpoint` truncates the per-round lineage
  * (the classic iterative-Spark plan-blowup trap), each round is one
  * equi-join plus one partial-combining hash-aggregation over the edge
  * frame, and the iteration count is a bounded knob — O(iters) rounds,
  * each O(|E|) scan, never a per-node driver loop.
  *
  * Edge-frame discipline shared by all the operators: the edge list
  * is REPARTITIONED AND SORTED once on the key the LOOP aggregates
  * on, then persisted (see `layoutEdges` — the cached
  * InMemoryRelation keeps that layout visible to the planner, which
  * a localCheckpoint would not), so the O(|E|) side is scanned in
  * place each round and only the O(|V|) rank/frontier frame moves.
  * Which key that is depends on the operator: the PageRank family
  * and BFS join the small frame on src (a broadcast) and then
  * aggregate the per-edge rows by DST, so a dst layout makes the
  * per-round aggregation exchange-free (with the broadcast hint:
  * q145 5.8 -> 3.9 s, q149 2.3 -> 1.6 s at sf0.1); k-core computes
  * degrees by SRC, so it keeps the src layout. The one-time
  * degree/node setup pays a single O(|E|) shuffle on the other key —
  * amortized across rounds.
  *
  * The PER-ROUND eager localCheckpoint of the rank/frontier frame is
  * load-bearing for plan quality, not just lineage hygiene: each
  * checkpoint hands the next round's planner an exact materialized
  * size (LogicalRDD stats), so the O(|V|)-side joins plan as
  * broadcasts. Batching rounds between checkpoints was measured
  * SLOWER (q145 4.9 -> 6.8 s at sf0.1): the deep un-materialized plan
  * loses those stats and falls back to shuffle joins mid-loop.
  */
object Graph {

  /** Edge normalization + the one-time layout all rounds reuse:
    * distinct (src, dst) pairs, hash-partitioned on `layoutKey` (src
    * or dst — pick the key the caller's loop AGGREGATES on, see the
    * object doc), sorted within partitions, checkpointed. ONE shuffle
    * total: the repartition comes FIRST, and HashPartitioning on
    * either single key already satisfies the (src, dst) clustering
    * the dedup aggregate needs (equal pairs are equal on each key),
    * so the distinct adds no second exchange.
    *
    * Callers that derive other frames from the same edge list (seeds,
    * degree audits) should build it once via this function and pass
    * `assumeLaidOut = true` to the operator — re-laying-out an already
    * checkpointed frame would double-materialize the O(|E|) data.
    *
    * The default layout is a `persist()` (materialized eagerly), NOT a
    * `localCheckpoint`: a checkpoint comes back as a `LogicalRDD` with
    * `UnknownPartitioning`, so every iteration's src-keyed join would
    * re-Exchange and re-Sort the full O(|E|) frame — the exact shuffle
    * this layout exists to pay once. The cached `InMemoryRelation`
    * keeps the `HashPartitioning` and the within-partition sort
    * visible to the planner (cached-plan partitioning is stable under
    * AQE), so per-round joins move only the O(|V|) rank frame. Lineage
    * is also kept, so an executor loss recomputes instead of killing
    * the job; edge lineage is shallow (no per-round growth), so the
    * truncation that iterated frames need doesn't apply here.
    *
    * `reliable = true` checkpoints to the SparkContext's checkpoint
    * directory (`sc.setCheckpointDir` must have been called) for
    * clusters where recomputing the edge build is too expensive to
    * risk under preemption; that variant re-shuffles per round (the
    * resilience/throughput trade is the caller's). */
  def layoutEdges(edges: DataFrame, srcCol: String, dstCol: String,
                  reliable: Boolean = false,
                  layoutKey: String = "src"): DataFrame = {
    require(layoutKey == "src" || layoutKey == "dst",
      s"layoutKey must be src or dst, got $layoutKey")
    val laid = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col(layoutKey))
      .distinct()
      .sortWithinPartitions(layoutKey)
    if (reliable) laid.checkpoint()
    else {
      val p = laid.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // materialize now — iterations read blocks, never rebuild
      p
    }
  }

  private def edgeFrame(edges: DataFrame, srcCol: String, dstCol: String,
                        assumeLaidOut: Boolean,
                        layoutKey: String = "src"): DataFrame =
    if (assumeLaidOut) edges
    else layoutEdges(edges, srcCol, dstCol, layoutKey = layoutKey)

  /** The PageRank family's one-time (id, __deg) node frame in ONE
    * aggregation: symmetrize the laid-out edges as (id, is-src) rows
    * and sum — one map-side-combined shuffle of 2|E| rows, replacing
    * the previous out-degree agg + union-distinct + left join (two
    * O(|E|) exchanges plus a join). __deg is NULL for sinks (rows
    * where only dst appearances summed to 0) — the convention every
    * loop relies on to skip sink contributions / detect dangling. */
  private def nodeFrame(e: DataFrame): DataFrame =
    e.select(col("src").as("id"), lit(1L).as("__o"))
      .union(e.select(col("dst").as("id"), lit(0L).as("__o")))
      .groupBy("id").agg(sum("__o").as("__sumo"))
      .select(col("id"), when(col("__sumo") > 0, col("__sumo")).as("__deg"))

  /** PageRank with INTEGER-EXACT arithmetic: scores live in micro-units
    * (a node starts at 1,000,000) and every step is BIGINT math —
    * contribution = r div outDegree (floor), next = base +
    * (dampNum * Σ contributions) div 100. Floating-point PageRank sums
    * contributions in arrival order, so two runs of the same job can
    * disagree in the last ulp and ranking ties can flip; the integer
    * formulation is partition-order-independent and bit-identical on
    * any engine — the property that makes a 100 TB ranking job
    * reproducible (and lets DuckDB replay it for the oracle, q145).
    *
    * Dangling mass: nodes appear in the rank table iff they touch an
    * edge; a node with in-edges but no out-edges keeps receiving rank
    * and contributes nothing (its mass decays — the standard
    * non-renormalized treatment; see `pageRankRedistributed` for the
    * conserving variant). Every edge list built from symmetric
    * co-occurrence (src↔dst both present) has no dangling nodes.
    *
    * Scale posture: the per-edge contribution is folded into the
    * O(|V|) rank frame FIRST (rank div deg — one row per source), and
    * while the node count stays under `broadcastRankRows` that frame
    * carries an EXPLICIT broadcast hint: a rank frame re-born from a
    * per-round localCheckpoint is a stats-less LogicalRDD, so the
    * static planner quotes it at the default (huge) size and plans a
    * sort-merge join — which EnsureRequirements backs with an O(|E|)
    * Exchange of the edge frame, and AQE's late broadcast conversion
    * cannot cancel a shuffle whose map stage already ran (measured:
    * the hint took the one-round edge Exchange from the plan
    * entirely). With the hint, a round touches the O(|E|) frame only
    * as an in-place scan of the dst-partitioned cache, and the
    * contribution aggregation that follows is partial-combining AND
    * exchange-free. The broadcast is SIZE-GATED, never unconditional
    * (the seededBfs discipline): the node frame is counted once from
    * its checkpointed blocks, and above the row bound rounds fall
    * back to the shuffle-join shape — the edge frame is re-laid-out
    * ONCE on src (one O(|E|) shuffle amortized over all rounds, so
    * per-round joins still scan it in place) and V is never held in
    * one executor. Iteration count is fixed (default 3), not
    * convergence-polled, so the job's shape is known in advance.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, base: Long = 150000L,
               dampNum: Long = 85L, assumeLaidOut: Boolean = false,
               broadcastRankRows: Long = 5000000L): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val e0 = edgeFrame(edges, srcCol, dstCol, assumeLaidOut,
      layoutKey = "dst")
    // out-degree is static, so it RIDES IN the rank frame (computed
    // once here via the fused nodeFrame agg, carried through every
    // round) — each round then builds its per-source contributions
    // with a projection instead of a ranks-deg join. Sink nodes carry
    // a null degree; they emit no contribution row (no matching src
    // in e), so the null never reaches the arithmetic.
    val nodes = nodeFrame(e0).localCheckpoint()
    val useBroadcast = nodes.count() <= broadcastRankRows
    val hint: DataFrame => DataFrame =
      if (useBroadcast) df => broadcast(df) else df => df
    // fallback regime: per-round joins are src-keyed shuffle joins, so
    // re-lay the edges on src once (amortized) instead of paying an
    // O(|E|) exchange every round; a caller-laid frame is kept as-is
    val e =
      if (useBroadcast || assumeLaidOut) e0
      else {
        val relaid = layoutEdges(e0, "src", "dst", layoutKey = "src")
        Checkpoints.free(e0)
        relaid
      }

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val perSrc = ranks.where(col("__deg").isNotNull)
        .select(col("id").as("src"), expr("rank_micro div __deg").as("__c"))
      val contrib = e.join(hint(perSrc), "src")
        .select(col("dst").as("id"), col("__c"))
      val sums = contrib.groupBy("id").agg(sum(col("__c")).as("__s"))
      val old = ranks
      ranks = nodes
        .join(hint(sums), Seq("id"), "left")
        .select(col("id"), col("__deg"),
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
      // round r+1's checkpoint no longer references round r's blocks
      Checkpoints.free(old)
    }
    // the returned frame is a self-contained checkpoint: the loop
    // scaffolding's blocks are dead and must not outlive the call
    Checkpoints.free(nodes)
    if (!assumeLaidOut) Checkpoints.free(e)
    ranks.select("id", "rank_micro")
  }

  /** PageRank with DANGLING-MASS REDISTRIBUTION — the renormalized
    * treatment `pageRank` documents as missing: each round the rank
    * held by dangling nodes (in-edges but no out-edges) is summed into
    * ONE scalar and redistributed equally to every node, so total rank
    * is conserved the way the standard formulation demands:
    * next = base + damp * (Σ in-contributions + danglingSum div N).
    *
    * Arithmetic stays INTEGER-EXACT (micro-units, BIGINT floor
    * division) — partition-order-independent, bit-identical across
    * engines, oracle-replayable as chained CTEs (q162). The dangling
    * share each node receives is danglingSum div N (floor), so a
    * sub-micro remainder < N decays per round instead of being
    * assigned arbitrarily — deterministic by construction.
    *
    * Scale posture: identical to `pageRank` (size-gated O(|V|)
    * broadcast, src re-layout in the fallback regime) plus, per
    * round, one partial-combining global aggregate over the
    * O(dangling) rank rows (a single-row frame) cross-joined back
    * BROADCAST — a scalar broadcast, never a shuffle. Dangling
    * membership is a static anti-join computed once. */
  def pageRankRedistributed(edges: DataFrame, srcCol: String, dstCol: String,
                            iters: Int = 3, base: Long = 150000L,
                            dampNum: Long = 85L,
                            assumeLaidOut: Boolean = false,
                            broadcastRankRows: Long = 5000000L): DataFrame = {
    require(iters >= 1, "pageRankRedistributed needs at least one iteration")
    val e0 = edgeFrame(edges, srcCol, dstCol, assumeLaidOut,
      layoutKey = "dst")
    // out-degree rides in the node frame (the pageRank discipline,
    // fused nodeFrame agg) — and doubles as dangling membership:
    // __deg IS NULL ⟺ the node has no out-edges, so the per-round
    // dangling-mass sum is a filter + aggregate, no membership join
    // at all.
    val nodes = nodeFrame(e0).localCheckpoint()
    val useBroadcast = nodes.count() <= broadcastRankRows
    val hint: DataFrame => DataFrame =
      if (useBroadcast) df => broadcast(df) else df => df
    val e =
      if (useBroadcast || assumeLaidOut) e0
      else {
        val relaid = layoutEdges(e0, "src", "dst", layoutKey = "src")
        Checkpoints.free(e0)
        relaid
      }
    val nCnt = nodes.agg(count(lit(1)).as("__n")).localCheckpoint()

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val perSrc = ranks.where(col("__deg").isNotNull)
        .select(col("id").as("src"), expr("rank_micro div __deg").as("__c"))
      val contrib = e.join(hint(perSrc), "src")
        .select(col("dst").as("id"), col("__c"))
      val sums = contrib.groupBy("id").agg(sum(col("__c")).as("__s"))
      val dsum = ranks.where(col("__deg").isNull)
        .agg(coalesce(sum("rank_micro"), lit(0L)).as("__d"))
      val old = ranks
      ranks = nodes
        .join(hint(sums), Seq("id"), "left")
        .crossJoin(broadcast(dsum))
        .crossJoin(broadcast(nCnt))
        .select(col("id"), col("__deg"),
          (lit(base) +
            expr(s"($dampNum * (coalesce(__s, 0L) + (__d div __n))) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
      Checkpoints.free(old)
    }
    Checkpoints.free(nodes)
    Checkpoints.free(nCnt)
    if (!assumeLaidOut) Checkpoints.free(e)
    ranks.select("id", "rank_micro")
  }

  /** PERSONALIZED PageRank (random-walk-with-restart): rank mass
    * starts at — and teleports back to — the SEED set only, so scores
    * measure proximity to the seeds rather than global importance
    * ("documents related to this set", label propagation from a
    * curated pool, expanding a seed corpus). Same INTEGER-EXACT
    * micro-unit arithmetic as `pageRank` (oracle-replayable, q168):
    * r0 = 1,000,000 for seeds else 0;
    * next = (seed ? base : 0) + (dampNum * Σ contributions) div 100.
    * Non-seed mass decays unless re-fed through the graph — the
    * standard non-renormalized personalized formulation.
    *
    * Scale posture: identical to `pageRank` (size-gated O(|V|)
    * broadcast, src re-layout in the fallback regime); the seed flag
    * is a left-semi-derived O(|V|) column, never a driver-side set. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, iters: Int = 3,
                           base: Long = 150000L, dampNum: Long = 85L,
                           assumeLaidOut: Boolean = false,
                           broadcastRankRows: Long = 5000000L): DataFrame = {
    require(iters >= 1, "personalizedPageRank needs at least one iteration")
    val e0 = edgeFrame(edges, srcCol, dstCol, assumeLaidOut,
      layoutKey = "dst")
    val seedIds = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct()
    // seed flag AND out-degree both ride in the node frame (fused
    // nodeFrame agg + one small seed join) — rounds project
    // contributions instead of joining deg
    val nodes = nodeFrame(e0)
      .join(seedIds.withColumn("__seed", lit(1L)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(0L)).as("__seed"),
        col("__deg"))
      .localCheckpoint()
    val useBroadcast = nodes.count() <= broadcastRankRows
    val hint: DataFrame => DataFrame =
      if (useBroadcast) df => broadcast(df) else df => df
    val e =
      if (useBroadcast || assumeLaidOut) e0
      else {
        val relaid = layoutEdges(e0, "src", "dst", layoutKey = "src")
        Checkpoints.free(e0)
        relaid
      }

    var ranks = nodes.withColumn("rank_micro",
      when(col("__seed") === 1L, lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val perSrc = ranks.where(col("__deg").isNotNull)
        .select(col("id").as("src"), expr("rank_micro div __deg").as("__c"))
      val contrib = e.join(hint(perSrc), "src")
        .select(col("dst").as("id"), col("__c"))
      val sums = contrib.groupBy("id").agg(sum(col("__c")).as("__s"))
      val old = ranks
      ranks = nodes
        .join(hint(sums), Seq("id"), "left")
        .select(col("id"), col("__seed"), col("__deg"),
          (when(col("__seed") === 1L, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(__s, 0L)) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
      Checkpoints.free(old)
    }
    Checkpoints.free(nodes)
    if (!assumeLaidOut) Checkpoints.free(e)
    ranks.select("id", "rank_micro")
  }

  /** Bounded-round k-core peeling: iteratively remove nodes whose
    * degree in the surviving induced subgraph is below `k`, for
    * `rounds` rounds, then return EVERY survivor with its final
    * induced-subgraph degree (zero included — a survivor can lose all
    * neighbors in the last peel; its reported degree may also sit
    * below `k`, which is exactly the signal that one more round would
    * peel it). The k-core is the classic
    * density/centrality filter (spam-farm detection, keeping only
    * well-connected documents in a citation graph); full peeling runs
    * to a fixpoint, but a bounded round count keeps the job shape
    * known in advance (the `pageRank` discipline) and each extra round
    * only tightens the approximation from above — after r rounds the
    * survivor set is a superset of the true k-core that already
    * excludes everything peelable within r steps.
    *
    * The edge list is treated as UNDIRECTED: it is symmetrized once
    * (src↔dst union, distinct) behind the one-time layout, so degree =
    * out-degree on the symmetrized frame. Everything is integer counts
    * and set membership — partition-order-independent, replayable as
    * chained CTEs by a SQL oracle (q171).
    *
    * Scale posture: each round is two semi-joins (restrict edges to
    * surviving endpoints) plus one partial-combining hash-agg for
    * degrees; the symmetrized edge frame is laid out and checkpointed
    * once and never re-shuffles. The survivor-set broadcast is
    * SIZE-GATED PER ROUND (the seededBfs discipline): the alive frame
    * only shrinks, so the gate re-reads each round's checkpointed
    * count and flips to shuffle semi-joins only while the set exceeds
    * `broadcastAliveRows` — never an unconditional O(|V|) broadcast.
    * Round cost is O(|E|) scan + O(surviving V) state, never per-node
    * driver work. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int = 3,
            broadcastAliveRows: Long = 5000000L): DataFrame = {
    require(k >= 1, "kCore needs k >= 1")
    require(rounds >= 1, "kCore needs at least one round")
    val directed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val e = layoutEdges(
      directed.union(directed.select(col("dst").as("src"), col("src").as("dst"))),
      "src", "dst")
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint()
    var aliveRows = alive.count()
    def hint(df: DataFrame): DataFrame =
      if (aliveRows <= broadcastAliveRows) broadcast(df) else df
    for (_ <- 1 to rounds) {
      val deg = e
        .join(hint(alive.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
        .join(hint(alive.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__deg"))
      val old = alive
      alive = deg.where(col("__deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint()
      aliveRows = alive.count()
      Checkpoints.free(old)
    }
    // final degree within the survivor-induced subgraph; the left join
    // keeps survivors whose last peel removed every neighbor (degree 0)
    // — the output is "the survivors", not "the survivors that still
    // have an edge". Checkpointed so the O(|E|) scaffolding can be
    // freed before return (the result is O(survivors) small).
    val deg = e
      .join(hint(alive.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
      .join(hint(alive.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("__deg"))
    val out = alive
      .join(deg.select(col("src").as("id"), col("__deg")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__deg"), lit(0L)).as("degree"))
      .localCheckpoint()
    Checkpoints.free(alive)
    Checkpoints.free(e)
    out
  }

  /** Full core DECOMPOSITION (every node's shell index), extending the
    * binary [[kCore]] question to the per-node readout influence /
    * robustness analyses want: shell(v) = the largest k ≤ `maxK` such
    * that v survives the bounded k-core peel. Peeling for k starts
    * from the (k−1)-core's survivors (cores are nested), so the frame
    * only shrinks; `roundsPerK` bounds each peel (the q149
    * bounded-round semantics — the oracle replays the IDENTICAL
    * bounded rounds, so the contract is exact, not approximate).
    *
    * Scale posture: the symmetric edge frame is laid out ONCE;
    * each peel round is two size-gated semi-joins + one combining
    * hash-agg (the kCore shape); shell assignment is one union of the
    * O(|V|) per-k survivor frames + a max-agg — maxK·roundsPerK
    * bounded rounds total, no windows, no driver loops. */
  def coreDecomposition(edges: DataFrame, srcCol: String, dstCol: String,
                        maxK: Int, roundsPerK: Int = 2,
                        broadcastAliveRows: Long = 5000000L): DataFrame = {
    require(maxK >= 1 && roundsPerK >= 1, "coreDecomposition bounds must be >= 1")
    val directed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val e = layoutEdges(
      directed.union(directed.select(col("dst").as("src"), col("src").as("dst"))),
      "src", "dst")
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint()
    var aliveRows = alive.count()
    def hint(df: DataFrame): DataFrame =
      if (aliveRows <= broadcastAliveRows) broadcast(df) else df
    val all = alive
    // the (id, k) survivor ledger is re-checkpointed per k so freed
    // intermediate alive frames are never reachable from it (a shell
    // snapshot reading a freed checkpoint would recompute-or-crash)
    var shellAcc: DataFrame = null
    for (k <- 1 to maxK) {
      for (_ <- 1 to roundsPerK) {
        val deg = e
          .join(hint(alive.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
          .join(hint(alive.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
          .groupBy("src").agg(count(lit(1)).as("__deg"))
        val old = alive
        alive = deg.where(col("__deg") >= k)
          .select(col("src").as("id"))
          .localCheckpoint()
        aliveRows = alive.count()
        if (!(old eq all)) Checkpoints.free(old)
      }
      val snap = alive.select(col("id"), lit(k.toLong).as("__k"))
      val oldAcc = shellAcc
      shellAcc =
        (if (shellAcc == null) snap else shellAcc.unionAll(snap))
          .localCheckpoint()
      if (oldAcc != null) Checkpoints.free(oldAcc)
    }
    // shell(v) = max k whose survivor set contains v; nodes peeled in
    // the k=1 rounds (never survivors) get shell 0 via the left join
    val out = all
      .join(shellAcc.groupBy("id").agg(max("__k").as("__s")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__s"), lit(0L)).as("shell"))
      .localCheckpoint()
    Checkpoints.free(alive)
    Checkpoints.free(shellAcc)
    Checkpoints.free(all)
    Checkpoints.free(e)
    out
  }

  /** Bounded-round synchronous label propagation (community
    * detection): labels start as node ids; each round every node
    * adopts the most frequent label among its NEIGHBORS, ties broken
    * by smallest label — fully deterministic, so an oracle replays the
    * rounds as chained CTEs (the `pageRank` discipline). Communities
    * are a different question from the CC family: CC answers
    * reachability, LPA clusters by connection DENSITY, so a bridge
    * edge between two dense clusters keeps them distinct labels.
    *
    * Per round: one src-keyed join of the O(|V|) label frame into the
    * once-laid-out symmetric edges, a (dst, label) combining count,
    * and a struct-max argmax — no windows, no doc×doc. The label
    * frame's broadcast is SIZE-GATED (the seededBfs discipline) on
    * the node count read once from the checkpointed init frame — the
    * frame is exactly O(|V|) every round, so one gate decides the
    * regime; above `broadcastLabelRows` rounds run as shuffle joins.
    * The round count is a compile-time bound (known job shape), and
    * each superseded label frame is freed when the next
    * materializes. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 2,
                       broadcastLabelRows: Long = 5000000L): DataFrame = {
    require(rounds >= 1, "labelPropagation needs at least one round")
    val directed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val e = layoutEdges(
      directed.union(directed.select(col("dst").as("src"), col("src").as("dst"))),
      "src", "dst")
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    val hint: DataFrame => DataFrame =
      if (labels.count() <= broadcastLabelRows) df => broadcast(df)
      else df => df
    for (_ <- 1 to rounds) {
      val cnt = e
        .join(hint(labels.select(col("id").as("src"), col("label"))), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("__c"))
      // argmax by (count desc, label asc) via struct max: negate the
      // label so the lexicographic max breaks count ties downward
      val best = cnt.groupBy("id")
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__b"))
        .select(col("id"), (-col("__b.__nl")).as("__new"))
      val old = labels
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint()
      Checkpoints.free(old)
    }
    Checkpoints.free(e)
    labels
  }

  /** Bounded-round multi-source BFS: hop distance from the nearest
    * seed, capped at `hops` rounds. Returns (id, dist) for reached
    * nodes only. Integer distances + `min` folds make every value
    * partition-order-independent (same reproducibility discipline as
    * `pageRank`), so an oracle can replay the rounds as chained CTEs.
    *
    * Default shape: each round joins the FULL distance table to the
    * edge frame rather than just the latest frontier — with hop counts
    * this small the simpler shape wins (no frontier-diff anti-join per
    * round), and the `min(dist)` re-aggregation makes re-discovered
    * nodes free. Scale: one equi-join on src + one hash-agg on id per
    * round, both partial-combining; the edge frame is laid out once;
    * rounds are a compile-time bound, so the job shape is known in
    * advance.
    *
    * `frontierOnly = true` switches to the frontier-propagation shape
    * for LARGER hop bounds: each round expands only the nodes first
    * reached in the previous round and anti-joins out already-settled
    * ids, so round cost is O(frontier edges), not O(V) — in unweighted
    * BFS a node's first-discovery distance is already minimal, so the
    * two shapes produce identical results (pinned in GraphSpec).
    *
    * The distance/frontier broadcast is SIZE-GATED PER ROUND (the
    * seededBfs discipline): the frame grows monotonically and is
    * re-checkpointed every round, so the gate reads each round's
    * cached count and the join flips to a shuffle join once the frame
    * crosses `broadcastFrontierRows` — never an unconditional O(|V|)
    * broadcast. In the shuffle regime the dst-laid edge frame pays a
    * per-round src exchange; a caller expecting that regime
    * throughout should pre-lay the edges on src and pass
    * `assumeLaidOut = true` (the seededBfs layout). */
  def boundedBfs(edges: DataFrame, srcCol: String, dstCol: String,
                 seeds: DataFrame, hops: Int,
                 frontierOnly: Boolean = false,
                 assumeLaidOut: Boolean = false,
                 broadcastFrontierRows: Long = 5000000L): DataFrame = {
    require(hops >= 0, "boundedBfs needs a non-negative hop bound")
    val e = edgeFrame(edges, srcCol, dstCol, assumeLaidOut,
      layoutKey = "dst")
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    if (frontierOnly) {
      var frontier = dist
      var frontierRows = frontier.count()
      for (_ <- 1 to hops) {
        val f = frontier.withColumnRenamed("id", "src")
        val joined =
          if (frontierRows <= broadcastFrontierRows) e.join(broadcast(f), "src")
          else e.join(f, "src")
        val fresh = joined
          .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
          .groupBy("id").agg(min("dist").as("dist"))
          .join(dist, Seq("id"), "left_anti")
          .localCheckpoint()
        frontierRows = fresh.count()
        val oldDist = dist
        val oldFrontier = frontier
        dist = dist.union(fresh).localCheckpoint()
        frontier = fresh
        Checkpoints.free(oldDist)
        // round 1's frontier IS the seed dist frame (already freed);
        // unpersist is idempotent so the double call is harmless
        Checkpoints.free(oldFrontier)
      }
      // hops = 0 leaves frontier aliased to the returned seed frame
      if (!(frontier eq dist)) Checkpoints.free(frontier)
    } else {
      var distRows = dist.count()
      for (_ <- 1 to hops) {
        val ds = dist.withColumnRenamed("id", "src")
        val joined =
          if (distRows <= broadcastFrontierRows) e.join(broadcast(ds), "src")
          else e.join(ds, "src")
        val next = joined
          .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
        val old = dist
        dist = dist.union(next)
          .groupBy("id").agg(min("dist").as("dist"))
          .localCheckpoint()
        distRows = dist.count()
        Checkpoints.free(old)
      }
    }
    if (!assumeLaidOut) Checkpoints.free(e)
    dist
  }

  /** Bounded-round SEED-KEYED multi-source BFS: per-(seed, node) hop
    * distance, i.e. `hops` independent BFS traversals batched into one
    * loop. Returns (seed, id, dist) for every (seed, reached-node)
    * pair — the frame landmark-centrality readouts fold over. Same
    * reproducibility discipline as `boundedBfs` (integer distances,
    * `min` folds, chained-CTE-replayable rounds) and the same
    * frontier-propagation shape: each round expands only last round's
    * discoveries and anti-joins the settled set.
    *
    * The frontier here is NOT O(|V|)-bounded — it is O(seeds ×
    * frontier width) and grows with both the landmark count and the
    * graph, so an unconditional broadcast would OOM the driver at
    * scale. The broadcast is therefore SIZE-GUARDED per round on the
    * materialized frontier row count (the frame is already
    * local-checkpointed, so the count reads cached blocks): below
    * `broadcastFrontierRows` the round is a broadcast join against the
    * laid-out edges; above it, a shuffle join (edges laid out on src
    * pay their exchange once at layout, the frontier reshuffles —
    * which is the small side by construction). Rounds end early when
    * the frontier empties. */
  def seededBfs(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, hops: Int,
                assumeLaidOut: Boolean = false,
                broadcastFrontierRows: Long = 5000000L): DataFrame = {
    require(hops >= 0, "seededBfs needs a non-negative hop bound")
    val e = edgeFrame(edges, srcCol, dstCol, assumeLaidOut, layoutKey = "src")
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("id"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var frontierRows = frontier.count()
    for (_ <- 1 to hops if frontierRows > 0) {
      val f = frontier.withColumnRenamed("id", "src")
      val joined =
        if (frontierRows <= broadcastFrontierRows) e.join(broadcast(f), "src")
        else e.join(f, "src")
      val fresh = joined
        .select(col("seed"), col("dst").as("id"), (col("dist") + 1).as("dist"))
        .groupBy("seed", "id").agg(min("dist").as("dist"))
        .join(dist, Seq("seed", "id"), "left_anti")
        .localCheckpoint()
      frontierRows = fresh.count()
      val oldDist = dist
      val oldFrontier = frontier
      dist = dist.union(fresh).localCheckpoint()
      frontier = fresh
      Checkpoints.free(oldDist)
      if (!(oldFrontier eq oldDist)) Checkpoints.free(oldFrontier)
    }
    if (!(frontier eq dist)) Checkpoints.free(frontier)
    if (!assumeLaidOut) Checkpoints.free(e)
    dist
  }

  /** Bounded-round multi-source BFS over a BITMASK — the MS-BFS idea
    * (Then et al., VLDB 2015, "The More the Merrier"): up to 64 seeds
    * share ONE traversal by riding a 64-bit mask per node, so a round
    * moves O(|V|) rows of one long instead of the O(seeds × |V|)
    * (seed, id, dist) rows [[seededBfs]] moves — at 64 landmarks that
    * is a 64× smaller frontier frame for the identical answer. The
    * per-round fold is bit_or (commutative, partial-combining), so
    * every value is partition-order-independent like the min-folds of
    * the row form; GraphSpec pins the two forms equal.
    *
    * Input `seeds`: (id, bit) with bit in [0, 64) unique per seed.
    * Returns (id, round, new_mask): the seeds that FIRST reach `id`
    * at hop `round` (round 0 = the seeds themselves) — first-discovery
    * distance is minimal under unit weights, so per-(seed, node) hop
    * distance reads directly off the round column.
    *
    * Scale posture: the edge frame is laid out once; each round is
    * one equi-join of the O(|V|) mask frame (broadcast under the
    * seededBfs-style row gate) plus one bit_or hash-agg; superseded
    * mask frames free as the next materializes. */
  def seededBfsBitmask(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, hops: Int,
                       assumeLaidOut: Boolean = false,
                       broadcastMaskRows: Long = 5000000L): DataFrame = {
    require(hops >= 0, "seededBfsBitmask needs a non-negative hop bound")
    val e = edgeFrame(edges, srcCol, dstCol, assumeLaidOut, layoutKey = "dst")
    // `store` is the round's CHECKPOINTED frame (freed when the next
    // round's store materializes — Checkpoints.free matches checkpoint
    // roots only, so projections of it are never passed to free)
    var store = seeds
      .select(col(seeds.columns.head).cast("long").as("id"),
        col(seeds.columns(1)).cast("int").as("bit"))
      .groupBy("id")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("mask"))
      .localCheckpoint()
    var cur = store
    var out = store.select(col("id"), lit(0).cast("int").as("round"),
      col("mask").as("new_mask")).localCheckpoint()
    var curRows = cur.count()
    for (r <- 1 to hops) {
      val cs = cur.select(col("id").as("src"), col("mask"))
      val joined =
        if (curRows <= broadcastMaskRows) e.join(broadcast(cs), "src")
        else e.join(cs, "src")
      val contrib = joined
        .groupBy(col("dst").as("id"))
        .agg(expr("bit_or(mask)").as("cmask"))
      val merged = cur.join(contrib, Seq("id"), "full_outer")
        .select(col("id"),
          expr("coalesce(mask, 0L) | coalesce(cmask, 0L)").as("mask"),
          expr("coalesce(cmask, 0L) & ~coalesce(mask, 0L)").as("new_mask"))
        .localCheckpoint()
      val newly = merged.where(col("new_mask") =!= 0L)
        .select(col("id"), lit(r).cast("int").as("round"), col("new_mask"))
      val oldOut = out
      out = out.union(newly).localCheckpoint()
      val oldStore = store
      store = merged
      cur = merged.select("id", "mask")
      curRows = merged.count()
      Checkpoints.free(oldStore)
      Checkpoints.free(oldOut)
    }
    if (!assumeLaidOut) Checkpoints.free(e)
    Checkpoints.free(store)
    out
  }

  /** Bounded-round single-source shortest paths over WEIGHTED edges
    * (Bellman-Ford): after `rounds` relaxations each reached node
    * carries the minimum total weight over all paths of at most
    * `rounds` edges from any seed. Weights are integer (cents,
    * micros — caller's unit) and the fold is `min`, so every value is
    * partition-order-independent and an oracle replays the rounds as
    * chained CTEs (q241) exactly like `boundedBfs`.
    *
    * Multi-edges collapse to their minimum weight up front (the only
    * weight a shortest path can use), fused into the one layout
    * shuffle: repartition on dst first, then the (src, dst) min-agg —
    * HashPartitioning on dst already satisfies the grouping's
    * clustering, so the aggregation adds no second exchange, and the
    * dst layout makes each round's per-edge relaxation aggregate
    * (group by dst) exchange-free under the broadcast-distance hint
    * (the `boundedBfs` discipline). Negative weights are rejected:
    * with `min` re-aggregation they would still converge, but bounded
    * rounds + negative cycles make "shortest within k hops" the only
    * honest semantics and the callers here are cost graphs.
    *
    * Scale posture: rounds move only the O(|V|) distance frame, its
    * broadcast SIZE-GATED PER ROUND on the checkpointed frame's row
    * count (the seededBfs discipline — the frame grows as relaxation
    * reaches new nodes, and above `broadcastDistRows` rounds flip to
    * shuffle joins instead of OOMing an executor); the edge frame is
    * scanned in place from its cache; superseded distance frames
    * unpersist as soon as the next round materializes. */
  def weightedSssp(edges: DataFrame, srcCol: String, dstCol: String,
                   weightCol: String, seeds: DataFrame, rounds: Int,
                   broadcastDistRows: Long = 5000000L): DataFrame = {
    require(rounds >= 0, "weightedSssp needs a non-negative round bound")
    val laid = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull)
      .repartition(col("dst"))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .sortWithinPartitions("dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(laid.where(col("w") < 0).isEmpty,
      "weightedSssp needs non-negative weights")
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var distRows = dist.count()
    for (_ <- 1 to rounds) {
      val ds = dist.withColumnRenamed("id", "src")
      val joined =
        if (distRows <= broadcastDistRows) laid.join(broadcast(ds), "src")
        else laid.join(ds, "src")
      val relaxed = joined
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val old = dist
      dist = dist.union(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
      distRows = dist.count()
      Checkpoints.free(old)
    }
    Checkpoints.free(laid)
    dist
  }

  /** HITS hubs-and-authorities (Kleinberg) with INTEGER-EXACT
    * arithmetic: scores live in micro-units and each half-step
    * normalizes by the maximum (score * 1e6 div max), so every round
    * is BIGINT floor math — partition-order-independent, bit-identical
    * across engines, and oracle-replayable as chained CTEs (q211) the
    * same way the PageRank family is (q145/q162/q168). Classical HITS
    * normalizes by the L2 norm; max-normalization preserves the
    * ranking while staying in integers (both converge to the principal
    * eigenvector direction under power iteration).
    *
    * auth(i) = Σ hub(j) over edges j→i, then scaled to max 1e6;
    * hub(j) = Σ auth(i) over edges j→i, then scaled. Nodes with no
    * in-edges carry auth 0; nodes with no out-edges carry hub 0.
    *
    * Scale posture: the edge frame is laid out once (dst-partitioned)
    * and each half-step folds scores into the O(|V|) frame first, then
    * joins under the SIZE-GATED broadcast hint (the `pageRank`
    * discipline — the node frame is counted once from its checkpoint;
    * above `broadcastRankRows` every half-step runs as a shuffle
    * join) — a round moves only O(|V|) rows. The per-round max is ONE
    * scalar row cross-joined broadcast (the `pageRankRedistributed`
    * discipline). Superseded score frames unpersist as soon as the
    * next round materializes. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2, scale: Long = 1000000L,
           assumeLaidOut: Boolean = false,
           broadcastRankRows: Long = 5000000L): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    val e = edgeFrame(edges, srcCol, dstCol, assumeLaidOut, layoutKey = "dst")
    val nodes = nodeFrame(e)
      .select(col("id"), col("__deg").isNotNull.as("__has_out"))
      .localCheckpoint()
    val hint: DataFrame => DataFrame =
      if (nodes.count() <= broadcastRankRows) df => broadcast(df)
      else df => df
    // half-step: sum a broadcast score frame over one edge side,
    // rescale to max `scale`, left-join back onto the node frame
    // the O(|V|) edge-fold `sums` feeds BOTH the max-scalar and the
    // node join; materializing IT (not the joined result) makes the
    // expensive O(|E|) join+aggregate run exactly once per half-step —
    // the max and the rescale join then read the checkpointed O(|V|)
    // blocks. (The earlier shape checkpointed the joined result
    // instead, which still evaluated the edge fold twice inside that
    // one job: q211 3.6 s → 3.3 s at sf0.1 — the edge-graph build
    // dominates that query, so the per-round win is bounded. An
    // unmaterialized chain
    // is far worse still — 2^rounds sub-plan replication, measured
    // 3.7 s → 9.9 s at iters = 2.)
    def halfStep(scores: DataFrame, scoreCol: String, joinSide: String,
                 aggSide: String, outCol: String): DataFrame = {
      val perSide = scores.where(col(scoreCol) > 0)
        .select(col("id").as(joinSide), col(scoreCol).as("__c"))
      val sums = e.join(hint(perSide), joinSide)
        .select(col(aggSide).as("id"), col("__c"))
        .groupBy("id").agg(sum("__c").as("__s"))
        .localCheckpoint()
      val mx = sums.agg(max("__s").as("__mx"))
      val out = nodes.join(hint(sums), Seq("id"), "left")
        .crossJoin(broadcast(mx)) // ONE row — size-independent, always hinted
        .select(col("id"), col("__has_out"),
          coalesce(expr(s"(__s * ${scale}L) div __mx"), lit(0L)).as(outCol))
        .localCheckpoint() // eager — sums' blocks are consumed here
      Checkpoints.free(sums)
      out
    }
    def freeIf(df: DataFrame): Unit = if (df != null) Checkpoints.free(df)
    var hubs = nodes.select(col("id"), col("__has_out"),
      when(col("__has_out"), lit(scale)).otherwise(lit(0L)).as("hub_micro"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val newAuths = halfStep(hubs.withColumnRenamed("hub_micro", "__v"),
        "__v", "src", "dst", "auth_micro")
      freeIf(auths)
      auths = newAuths
      val oldHubs = hubs
      hubs = halfStep(auths.withColumnRenamed("auth_micro", "__v"),
        "__v", "dst", "src", "hub_micro")
      freeIf(oldHubs)
    }
    val out = hubs.select(col("id"), col("hub_micro"))
      .join(auths.select(col("id"), col("auth_micro")), "id")
      .localCheckpoint()
    freeIf(hubs); freeIf(auths); Checkpoints.free(nodes)
    if (!assumeLaidOut) Checkpoints.free(e)
    out
  }

  /** Bounded k-truss peel over an UNDIRECTED canonical edge list
    * (id_a < id_b, one row per edge): each round computes every edge's
    * triangle support (number of triangles it participates in) and
    * drops edges with support < k-2, for `rounds` rounds — the
    * cohesive-subgraph filter that separates genuinely interlinked
    * duplicate/citation clusters from chains of incidental pairwise
    * matches (an edge in a k-truss has k-2 independent witnesses).
    * Like [[kCore]], a FIXED round budget rather than
    * convergence-polling: each extra round costs three O(|E|)
    * equi-joins, and in curation graphs support stabilizes within a
    * couple of peels; the result after r rounds is a superset of the
    * true k-truss, shrinking toward it monotonically. Returns the
    * surviving edges with their final-round support.
    *
    * Shape per round: the canonical-orientation triangle enumeration
    * (e1⋈e2 on the shared middle node, closed by e3 — every triangle
    * found exactly once, the `Dedup.triangleCount` pattern), then the
    * three edge-role projections union into one map-side-combined
    * support count, then an equi-join filter. All joins are on node
    * ids; no cross joins; hub-degree skew is the thing to cap
    * upstream (as `lshCandidatePairs` does with maxBucket).
    * Superseded edge frames unpersist as each round materializes. */
  def kTrussEdges(pairs: DataFrame, k: Int, rounds: Int = 2): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3 (support threshold k-2 >= 1)")
    require(rounds >= 1, "kTrussEdges needs at least one round")
    def support(e: DataFrame): DataFrame = {
      val t = e.select(col("id_a").as("x"), col("id_b").as("y"))
        .join(e.select(col("id_a").as("y"), col("id_b").as("z")), "y")
        .join(e.select(col("id_a").as("x"), col("id_b").as("z")), Seq("x", "z"))
        .select(col("x"), col("y"), col("z"))
      t.select(col("x").as("id_a"), col("y").as("id_b"))
        .union(t.select(col("x").as("id_a"), col("z").as("id_b")))
        .union(t.select(col("y").as("id_a"), col("z").as("id_b")))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("support"))
    }
    // canonicalize internally: the triangle enumeration assumes ONE
    // orientation per undirected edge (id_a < id_b); a caller passing
    // both orientations or reversed pairs would silently under- or
    // double-count support, so least/greatest + distinct removes the
    // precondition for one cheap projection. Self-loops drop (a = b
    // can't be part of a triangle under strict orientation).
    var e = pairs.select(
      least(col("id_a"), col("id_b")).cast("long").as("id_a"),
      greatest(col("id_a"), col("id_b")).cast("long").as("id_b"))
      .where(col("id_a") < col("id_b")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      // inner join drops support-0 edges for free (no row, threshold
      // k-2 >= 1 can't hold); survivors re-checkpoint, old frame frees
      val old = e
      e = e.join(support(e), Seq("id_a", "id_b"))
        .where(col("support") >= k - 2)
        .select("id_a", "id_b").localCheckpoint()
      Checkpoints.free(old)
    }
    val out = e.join(support(e), Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("support"))
      .localCheckpoint()
    Checkpoints.free(e)
    out
  }

  /** Bounded topological layering of a DAG (Kahn's algorithm as a
    * distributed peel): round r assigns layer r to every node with no
    * incoming edge from the still-alive set, then removes those nodes
    * — the dependency-scheduling readout ("which pipeline stages can
    * run in parallel, and in what wave"). `rounds` bounds the peel the
    * way [[kCore]]/[[kTrussEdges]] bound theirs: nodes deeper than
    * `rounds` waves return layer = -1 (still blocked), so callers see
    * exactly how far the budget reached; a cyclic input never
    * terminates Kahn's algorithm anyway, and here simply leaves the
    * cycle members at -1 — bounded rounds turn cycle detection into a
    * readable output instead of a hang.
    *
    * Shape per round: one semi-join to restrict edges to alive
    * endpoints, one distinct-dst projection (the blocked set), one
    * anti-join (alive minus blocked = this wave). All joins on node
    * ids; the alive frame is O(V) and re-checkpoints per round with
    * the superseded frame freed. */
  def topoLayers(edges: DataFrame, srcCol: String, dstCol: String,
                 rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "topoLayers needs at least one round")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var alive = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct().localCheckpoint()
    // ONE materialization per round: the blocked set (nodes with an
    // unfinished dependency) joins back as a FLAG, and the round
    // checkpoints the flagged frame once — the wave (flag null) and
    // the next alive (flag set) are then filters over the same
    // materialized blocks, so `blocked` is computed exactly once per
    // round and wave frames never need their own checkpoint
    // (constant-depth lineage off the flagged frame; measured
    // 2.9 s -> 1.7 s at 4 rounds on the q276 graph, sf0.1).
    val alive0 = alive
    val marked = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val eAlive = e0
        .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
      val blocked = eAlive.select(col("dst").as("id")).distinct()
        .withColumn("__b", lit(1))
      marked += alive.join(blocked, Seq("id"), "left")
        .select(col("id"), col("__b"), lit(r).cast("int").as("__r"))
        .localCheckpoint()
      alive = marked.last.where(col("__b").isNotNull).select("id")
    }
    val result = marked
      .map(m => m.where(col("__b").isNull)
        .select(col("id"), col("__r").as("layer")))
      .reduce(_ unionByName _)
      .unionByName(alive.select(col("id"), lit(-1).cast("int").as("layer")))
      .localCheckpoint()
    marked.foreach(Checkpoints.free)
    Checkpoints.free(alive0)
    e0.unpersist(false)
    result
  }

  /** Per-node triangle count and local clustering coefficient over an
    * undirected graph — the standard "how knit is this node's
    * neighborhood" readout (Watts–Strogatz 1998): cc(v) =
    * 2·tri(v) / (deg(v)·(deg(v)−1)), reported in exact ppm via
    * integer floor division (both operands non-negative).
    *
    * Input canonicalizes internally exactly like [[kTrussEdges]]
    * (least/greatest + distinct, self-loops dropped), so callers may
    * pass either or both orientations. Triangle enumeration is the
    * same strict-orientation three-way equi-join (x<y<z, each triangle
    * materialized exactly once); per-node counts come from unioning
    * the three corner projections into one map-side-combined
    * aggregation — never a neighborhood cross join. Degree is two
    * projections of the canonical edge list. At corpus scale the
    * candidate edge list must be hub-capped upstream (the
    * `lshCandidatePairs` maxBucket discipline) — triangle join cost is
    * Σ deg(v)², which the cap bounds. */
  def clusteringCoefficient(pairs: DataFrame): DataFrame = {
    val e = pairs.select(
      least(col("id_a"), col("id_b")).cast("long").as("id_a"),
      greatest(col("id_a"), col("id_b")).cast("long").as("id_b"))
      .where(col("id_a") < col("id_b")).distinct().localCheckpoint()
    val t = e.select(col("id_a").as("x"), col("id_b").as("y"))
      .join(e.select(col("id_a").as("y"), col("id_b").as("z")), "y")
      .join(e.select(col("id_a").as("x"), col("id_b").as("z")), Seq("x", "z"))
      .select(col("x"), col("y"), col("z"))
    val triPerNode = t.select(col("x").as("id"))
      .union(t.select(col("y").as("id")))
      .union(t.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("id_a").as("id"))
      .union(e.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val out = deg.join(triPerNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_ppm", when(col("degree") >= 2,
        expr("(n_tri * 2000000) div (degree * (degree - 1))"))
        .otherwise(lit(0L)))
      .localCheckpoint()
    Checkpoints.free(e)
    out
  }

  /** Borůvka minimum-spanning-forest over UNIQUE-keyed undirected
    * edges, bounded rounds — the contraction-based graph primitive
    * (the others here are propagation-based): each round every
    * component selects its minimum-key incident edge, the selected
    * edges join the forest, and the touched components CONTRACT into
    * one. With a totally-ordered `key` (callers fold weight + src +
    * dst into one BIGINT, so ties cannot exist) the forest is unique
    * and every step is a min-fold — the whole run replays as chained
    * CTEs (the q149/q319 oracle discipline).
    *
    * Contraction is a FIXED `labelIters` of min-label iterations over
    * the per-round merge graph (a frame of O(components) edges, not
    * O(E)) — fixed, not converge-early, so an engine replaying the
    * same iteration count produces bit-identical intermediate labels
    * even on a pathological merge chain that has not fully collapsed;
    * an uncollapsed pair simply re-selects its connecting edge next
    * round (the forest set dedups by key). Classic Borůvka converges
    * in O(log V) rounds; `rounds` bounds the work honestly, like
    * boundedBfs's hops.
    *
    * Scale posture: per round, two keyed joins attach component
    * labels to the laid-out edge frame (the O(V) component frame is
    * the small side — AQE broadcasts while it fits, the
    * pageRank-style fallback being a shuffle join), one min-agg over
    * 2·|cross-edges| rows, then `labelIters` folds over the
    * O(components) merge frame. Superseded component frames free as
    * each round materializes.
    *
    * Input `edges`: (src, dst, key) with src < dst canonical and key
    * globally unique. Returns the selected edge keys.
    */
  /** Exactly `iters` synchronous min-label iterations over a (both-
    * orientation) merge graph, in one in-memory task — the bounded
    * twin of the shuffled loop in boruvkaMsf, used under the same
    * size discipline as Dedup's singleTaskComponents. Synchronous =
    * iteration i+1 reads only iteration i's labels, so the result is
    * bit-identical to the groupBy-min loop for ANY input. Returns
    * (c, l) for nodes appearing in the merge graph only. */
  private def boundedMinLabels(mer: DataFrame, iters: Int): DataFrame = {
    val spark = mer.sparkSession
    import spark.implicits._
    mer.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val adj = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        it.foreach { case (a, b) =>
          adj.getOrElseUpdate(a,
            new scala.collection.mutable.ArrayBuffer[Long]) += b
        }
        var cur = scala.collection.mutable.LongMap.empty[Long]
        adj.foreachKey(k => cur(k) = k)
        for (_ <- 1 to iters) {
          val next = scala.collection.mutable.LongMap.empty[Long]
          adj.foreach { case (k, ns) =>
            var m = cur(k)
            ns.foreach { n => val ln = cur(n); if (ln < m) m = ln }
            next(k) = m
          }
          cur = next
        }
        cur.iterator
      }
      .toDF("c", "l")
  }

  def boruvkaMsf(edges: DataFrame, rounds: Int = 4,
                 labelIters: Int = 4,
                 singleTaskLabelEdges: Long = 2000000L,
                 broadcastCompRows: Long = 5000000L): DataFrame = {
    require(rounds >= 1 && labelIters >= 1,
      "boruvkaMsf needs at least one round and one label iteration")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("key").cast("long").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    var comp = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    // O(V) frame: broadcast only while it provably fits (row-count
    // gate, same discipline as the singleTaskLabelEdges bound below) —
    // an unconditional broadcast() hint would force BroadcastHashJoin
    // past driver memory instead of falling back to a shuffle join.
    var compRows = comp.count()
    var msf = e.sparkSession.emptyDataFrame
    var msfInit = false
    val roundFrames = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // Result-preserving shortcuts the oracle need not mirror: the
    // cross-edge frame stays LAZY — it is two size-gated broadcast
    // joins of the O(V) component frame against the persisted edge
    // blocks (narrow, no shuffle, no exchange while the gate holds;
    // shuffle joins above it), so re-deriving it per consumer is
    // cheaper than materializing O(E) checkpoint blocks every round;
    // and an empty selection means every later round selects nothing
    // too, so the loop breaks.
    var exhausted = false
    for (_ <- 1 to rounds if !exhausted) {
      val ca = comp.select(col("id").as("src"), col("comp").as("__ca"))
      val cb = comp.select(col("id").as("dst"), col("comp").as("__cb"))
      val small = compRows <= broadcastCompRows
      val ec = e
        .join(if (small) broadcast(ca) else ca, "src")
        .join(if (small) broadcast(cb) else cb, "dst")
        .where(col("__ca") =!= col("__cb"))
      // min incident edge per component, both endpoint roles
      val sel = ec.select(col("__ca").as("__c"), col("key"))
        .union(ec.select(col("__cb").as("__c"), col("key")))
        .groupBy("__c").agg(min("key").as("key"))
        .select("key").distinct()
      val se = ec.join(sel, Seq("key"), "left_semi")
        .select(col("key"), col("__ca"), col("__cb"))
        .localCheckpoint()
      val seCnt = se.count()
      if (seCnt == 0) {
        Checkpoints.free(se)
        exhausted = true
      } else {
        // se frames are O(components) — keep their blocks until `out`
        // materializes (msf reads them), then free in one sweep
        roundFrames += se
        msf = if (msfInit) msf.union(se.select("key"))
          else se.select("key")
        msfInit = true
        // contract: fixed-iteration min-label over the merge graph.
        // Labels are computed for TOUCHED components only (both
        // orientations are in `mer`, so propagation can neither reach
        // nor be influenced by an untouched component — its label is
        // its own id), which keeps the label frame O(selected edges),
        // not O(components). Under the singleTaskComponents size bound
        // the same `labelIters` synchronous iterations run in ONE
        // in-memory task instead of ~3 shuffle stages per iteration —
        // result-identical by construction (same recurrence, same
        // iteration count); above the bound the shuffled loop runs,
        // so the 100 TB path never funnels through one task.
        val mer = se.select(col("__ca").as("a"), col("__cb").as("b"))
          .union(se.select(col("__cb").as("a"), col("__ca").as("b")))
        var lab =
          if (seCnt <= singleTaskLabelEdges) {
            boundedMinLabels(mer, labelIters)
          } else {
            var l = mer.select(col("a").as("c")).distinct()
              .select(col("c"), col("c").as("l"))
            for (_ <- 1 to labelIters) {
              l = l.select(col("c"), col("l"))
                .union(mer.join(l.select(col("c").as("b"), col("l")), "b")
                  .select(col("a").as("c"), col("l")))
                .groupBy("c").agg(min("l").as("l"))
            }
            l
          }
        val oldComp = comp
        comp = comp.join(
            lab.select(col("c").as("comp"), col("l")), Seq("comp"), "left")
          .select(col("id"),
            coalesce(col("l"), col("comp")).as("comp"))
          .localCheckpoint()
        Checkpoints.free(oldComp)
      }
    }
    val out =
      (if (msfInit) msf.distinct() else e.select("key").limit(0))
        .localCheckpoint()
    Checkpoints.free(comp)
    Checkpoints.free(e)
    roundFrames.foreach(Checkpoints.free)
    out
  }
}
