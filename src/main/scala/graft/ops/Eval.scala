package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators for the curation pipeline's learned
  * filters (the q201 linear-probe family): once a quality classifier
  * scores documents, these measure how good the scores are — exactly,
  * so the numbers are reproducible across engines and runs.
  */
object Eval {

  /** Exact ROC AUC in parts-per-million, via the Mann–Whitney
    * rank-sum identity: AUC = P(score⁺ > score⁻) + ½·P(tie). Computed
    * without ranks or floats — one hash-agg to per-distinct-score
    * (n_pos, n_neg) counts, a cumulative window over that O(distinct
    * scores) frame (never over the corpus), then
    *
    *   U2 = Σ_s  2·n_pos(s)·cumneg_below(s) + n_pos(s)·n_neg(s)
    *
    * (pairs won counted twice plus ties counted once), so
    * auc_ppm = U2·10⁶ div (2·P·N) is a single integer division at the
    * end. The corpus shuffles once (the score-count agg is map-side
    * combining); everything after runs on the distinct-score frame.
    * Returns one row: n_pos, n_neg, u2, auc_ppm.
    *
    * Labels are anything boolean; scores any integral column. Ties
    * across classes are handled exactly — the ½ credit is the U2
    * doubling, not a float. */
  def aucPpm(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cumneg_below",
        coalesce(sum("n_neg").over(w), lit(0L)))
      .agg(
        sum("n_pos").as("n_pos"),
        sum("n_neg").as("n_neg"),
        sum(col("n_pos") * (col("cumneg_below") * 2 + col("n_neg")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("(u2 * 1000000L) div (n_pos * n_neg * 2L)").as("auc_ppm"))
  }
}
