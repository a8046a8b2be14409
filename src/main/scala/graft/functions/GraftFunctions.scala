package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native expressions.
  *
  * Preferred wiring: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (injectFunction). `register(spark)` is the programmatic equivalent
  * for sessions created without the conf — idempotent, called by the
  * ops that use the functions.
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashShingles].getName, "graft_rolling_hash"),
      (args: Seq[Expression]) => RollingHashShingles(args(0),
        args(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_fold_accents"),
      new ExpressionInfo(classOf[UnicodeStripAccents].getName, "graft_fold_accents"),
      (args: Seq[Expression]) => UnicodeStripAccents(args.head)),
    (FunctionIdentifier("graft_lcs"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs"),
      (args: Seq[Expression]) => LcsLength(args(0), args(1))),
    (FunctionIdentifier("graft_multi_contains"),
      new ExpressionInfo(classOf[MultiPatternMatches].getName, "graft_multi_contains"),
      (args: Seq[Expression]) => {
        // Fail analysis with a clear message, not an opaque
        // ClassCastException/NPE: the pattern array must be a foldable
        // array<string> with no null elements (the automaton is built
        // once at planning time).
        def bad(detail: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              ("graft_multi_contains(text, patterns): patterns must be " +
                s"a foldable array<string> of non-null literals; $detail")))
        if (args.length != 2) bad(s"got ${args.length} arguments")
        if (!args(1).foldable) bad("second argument is not foldable")
        args(1).dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) => ()
          case other => bad(s"second argument has type ${other.sql}")
        }
        val arr = args(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        if (arr == null) bad("second argument evaluates to null")
        MultiPatternMatches(args(0),
          (0 until arr.numElements()).map { i =>
            val p = arr.getUTF8String(i)
            if (p == null) bad(s"pattern element $i is null")
            p.toString
          })
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "graft_kmv_distinct"),
      (args: Seq[Expression]) => KmvDistinct(args.head,
        if (args.length > 1) args(1).eval().asInstanceOf[Number].intValue() else 256,
        if (args.length > 2) args(2).eval().asInstanceOf[Number].intValue() else 0)
        .toAggregateExpression()),
    (FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(classOf[HllDistinct].getName, "graft_hll_distinct"),
      (args: Seq[Expression]) =>
        HllDistinct(args.head).toAggregateExpression()),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKPairs(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
    // the blocklist-fusion optimizer rule (plans/FuseMultiContains);
    // extraOptimizations is the post-hoc equivalent of
    // injectOptimizerRule for sessions built without the conf
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.FuseMultiContains)) {
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.FuseMultiContains
    }
    val extra2 = spark.experimental.extraOptimizations
    if (!extra2.contains(graft.plans.PushFilterThroughGreedyThin)) {
      spark.experimental.extraOptimizations =
        extra2 :+ graft.plans.PushFilterThroughGreedyThin
    }
    val extra3 = spark.experimental.extraOptimizations
    if (!extra3.contains(graft.plans.PruneColumnsThroughGreedyThin)) {
      spark.experimental.extraOptimizations =
        extra3 :+ graft.plans.PruneColumnsThroughGreedyThin
    }
    // stats-fed broadcast planning (plans/StatsBroadcast): a no-op
    // until Relational.analyzeForCbo fills the ledger
    val extra4 = spark.experimental.extraOptimizations
    if (!extra4.contains(graft.plans.StatsBroadcastJoin)) {
      spark.experimental.extraOptimizations =
        extra4 :+ graft.plans.StatsBroadcastJoin
    }
    // the greedy-thinning planner strategy (plans/GreedyThin) — the
    // extraStrategies twin of injectPlannerStrategy
    val strats = spark.experimental.extraStrategies
    if (!strats.contains(graft.plans.GreedyThinStrategy)) {
      spark.experimental.extraStrategies =
        strats :+ graft.plans.GreedyThinStrategy
    }
  }

  /** HLL distinct-count aggregate over a pre-hashed 32-bit column
    * (Sampling.hashLong); register the functions first. */
  def hllDistinct(c: Column): Column = call_function("graft_hll_distinct", c)

  /** Exact bounded top-k aggregate: the k largest (key, id) pairs per
    * group under (key DESC, id ASC) as array<struct<key, id>> — O(k)
    * state, map-side combining (the rank-window replacement); `id`
    * must be unique. Register the functions first. */
  def topK(key: Column, id: Column, k: Int): Column =
    call_function("graft_topk", key, id,
      org.apache.spark.sql.functions.lit(k))

  /** Column-level dot product backed by the codegen'd expression.
    * Callers must have registered the functions on the session first
    * (any graft.ops.Similarity entry point does this). */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Column-level accent fold (NFD + strip combining marks) backed by
    * the codegen'd expression; register the functions first. */
  def foldAccents(c: Column): Column = call_function("graft_fold_accents", c)

  /** Column-level LCS length over two token arrays backed by the
    * codegen'd expression; register the functions first. */
  def lcsNative(a: Column, b: Column): Column = call_function("graft_lcs", a, b)

  /** Sorted 1-based ids of the fixed patterns occurring in `text`,
    * via the one-pass Aho–Corasick expression; register first. */
  def multiContains(text: Column, patterns: Seq[String]): Column =
    call_function("graft_multi_contains", text,
      org.apache.spark.sql.functions.array(
        patterns.map(org.apache.spark.sql.functions.lit): _*))
}

/** SparkSessionExtensions hook: enables
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.FuseMultiContains)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughGreedyThin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughGreedyThin)
    ext.injectOptimizerRule(_ => graft.plans.StatsBroadcastJoin)
    ext.injectPlannerStrategy(_ => graft.plans.GreedyThinStrategy)
  }
}
