package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute

/** Public entry for the greedy temporal-thinning operator (see
  * [[GreedyThin]]). Resolves the named columns against the frame,
  * wraps its analyzed plan in the custom logical node, and hands the
  * result back as a DataFrame so it composes with everything else. */
object GreedyThinOp {

  /** Keep, per `keyCols` group in (tsCol, tieCols) order, only rows
    * >= `gapMicros` after the previously KEPT row. `tsCol` must be a
    * timestamp or epoch-micros long; rows with null ts/keys must be
    * filtered upstream. */
  def thin(df: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCols: Seq[String], gapMicros: Long): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute =
      child.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"greedyThin: no column '$n' in [${child.output.map(_.name).mkString(", ")}]"))
    org.apache.spark.sql.graftglue.GraftPlanApi.ofRows(spark,
      GreedyThin(keyCols.map(attr), attr(tsCol), tieCols.map(attr),
        gapMicros, child))
  }
}
