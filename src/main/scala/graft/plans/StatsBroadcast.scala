package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Collected-statistics ledger the [[StatsBroadcastJoin]] rule eats —
  * the consumer the q395 ANALYZE lane was missing (r9 verdict #8:
  * "the CBO's food, but nothing eats it").
  *
  * Keyed by the relation's root path (what the optimizer can see on a
  * scan node). Values are the ANALYZE outputs: exact row count, mean
  * row width, and per-column NDV. Filled explicitly by
  * [[graft.ops.Relational.analyzeForCbo]]; empty ledger = rule is a
  * no-op, so nothing changes for sessions that never ANALYZE.
  */
object StatsLedger {
  /** `scanBytes` is the relation's on-disk size AT ANALYZE TIME — the
    * staleness fingerprint. Stats only ever say "this side is small
    * enough to broadcast", so a STALE small row count after the table
    * grew is the one dangerous direction (it could force a broadcast
    * of a now-huge side). The rule compares the scan's current size
    * against this fingerprint and goes silent when the table has
    * materially outgrown its ANALYZE. 0 = unknown (no gate). */
  case class TableStats(rows: Long, avgRowBytes: Long, ndv: Map[String, Long],
                        scanBytes: Long = 0L)

  private val stats =
    new java.util.concurrent.ConcurrentHashMap[String, TableStats]()

  def put(pathKey: String, s: TableStats): Unit = stats.put(pathKey, s)
  def get(pathKey: String): Option[TableStats] = Option(stats.get(pathKey))
  def clear(): Unit = stats.clear()
}

/** Stats-fed broadcast planning: use ANALYZE-collected row counts and
  * NDVs to broadcast a join side whose POST-FILTER cardinality is
  * small, in the case Catalyst's size-only estimation cannot see —
  * `Filter` keeps the child's `sizeInBytes` unchanged (no CBO stats),
  * so a 100-row slice of a 200 MB dimension still "weighs" 200 MB and
  * statically plans as a sort-merge join.
  *
  * Why AQE is not enough at 100 TB: AQE converts SMJ → BHJ only at the
  * shuffle-stage boundary, AFTER both sides' shuffle maps ran — the
  * fact side has already paid its full shuffle WRITE (the dominant
  * cost of a 100 TB join) before the runtime size of the dim side is
  * known. A static pre-shuffle broadcast decision removes that
  * exchange from the plan entirely. This rule makes the static
  * decision from MEASURED stats, which is exactly what warehouse CBOs
  * do with ANALYZE output (public designs: Spark's own CBO
  * joinReorder/stats docs, the classic Selinger selectivity model).
  *
  * Selectivity model (deliberately conservative — overestimating rows
  * only forfeits the optimization, never risks a bad broadcast):
  * equality-with-literal multiplies by 1/ndv(col), IN-list by
  * |list|/ndv, any other predicate by 1 (no reduction). The estimate
  * exists only when the subtree bottoms out at ledger-known scans
  * through Filter/Project; anything else (joins, aggregates, unions)
  * yields no estimate and the rule stays silent. Sides already
  * carrying a user hint are never touched.
  */
object StatsBroadcastJoin extends Rule[LogicalPlan] {

  /** Estimated post-filter bytes for a scan-Filter-Project subtree,
    * from ledger stats only. None = not estimable, stay silent. */
  private def estimateBytes(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => estimateBytes(child)
    case Filter(cond, child) =>
      estimateRowsAndWidth(child).map { case (rows, width) =>
        val sel = selectivity(cond, child)
        math.max((rows * sel).toLong, 1L) * width
      }
    case other =>
      estimateRowsAndWidth(other).map { case (rows, width) => rows * width }
  }

  private def estimateRowsAndWidth(plan: LogicalPlan): Option[(Long, Long)] =
    plan match {
      case SubqueryAlias(_, child) => estimateRowsAndWidth(child)
      case Project(_, child) => estimateRowsAndWidth(child)
      case Filter(cond, child) =>
        estimateRowsAndWidth(child).map { case (rows, width) =>
          (math.max((rows * selectivity(cond, child)).toLong, 1L), width)
        }
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val key = fs.location.rootPaths.headOption.map(_.toString)
        key.flatMap(StatsLedger.get)
          // staleness gate: if the scan's CURRENT bytes materially
          // exceed the ANALYZE-time fingerprint (>25% growth), the
          // ledger's row count can no longer bound the broadcast —
          // stay silent rather than risk broadcasting a grown table
          .filter(s => s.scanBytes <= 0L ||
            fs.sizeInBytes <= s.scanBytes + s.scanBytes / 4)
          .map(s => (s.rows, s.avgRowBytes))
      case _ => None
    }

  /** The ledger key the rule will use for a frame that bottoms out at
    * one file scan — callers hand this to `analyzeForCbo`. */
  def pathKeyOf(df: org.apache.spark.sql.DataFrame): Option[String] =
    scanKey(df.queryExecution.analyzed)

  /** Conjunct-product selectivity from ledger NDVs; ≥ some floor so a
    * stale huge NDV cannot zero the estimate. */
  private def selectivity(cond: Expression, child: LogicalPlan): Double = {
    def ndvOf(a: AttributeReference): Option[Long] =
      scanKey(child).flatMap(StatsLedger.get).flatMap(_.ndv.get(a.name))
    def one(e: Expression): Double = e match {
      case And(l, r) => one(l) * one(r)
      case EqualTo(a: AttributeReference, _: Literal) =>
        ndvOf(a).map(n => 1.0 / math.max(n, 1L)).getOrElse(1.0)
      case EqualTo(_: Literal, a: AttributeReference) =>
        ndvOf(a).map(n => 1.0 / math.max(n, 1L)).getOrElse(1.0)
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        ndvOf(a).map(n => math.min(list.size.toDouble / math.max(n, 1L), 1.0))
          .getOrElse(1.0)
      case _ => 1.0
    }
    one(cond)
  }

  private def scanKey(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => scanKey(child)
    case Project(_, child) => scanKey(child)
    case Filter(_, child) => scanKey(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toString)
    case _ => None
  }

  private def threshold: Long =
    SQLConf.get.getConf(SQLConf.AUTO_BROADCASTJOIN_THRESHOLD)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val thr = threshold
    if (thr <= 0) return plan // broadcast disabled: respect it
    plan.transform {
      case j @ Join(left, right, joinType, _, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        // only add a hint where the static planner would NOT already
        // broadcast (its own size estimate is above threshold) and our
        // measured estimate is safely below
        // ledger lookup first: with an empty ledger (the common case)
        // this short-circuits before touching the side's stats
        def eligible(side: LogicalPlan): Boolean =
          estimateBytes(side).exists(_ <= thr) &&
            side.stats.sizeInBytes > BigInt(thr)
        val canRight = joinType match {
          case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
          case _ => false
        }
        val canLeft = joinType match {
          case Inner | Cross | RightOuter => true
          case _ => false
        }
        val bc = Some(HintInfo(strategy = Some(BROADCAST)))
        if (canRight && eligible(right))
          j.copy(hint = JoinHint(None, bc))
        else if (canLeft && eligible(left))
          j.copy(hint = JoinHint(bc, None))
        else j
    }
  }
}
