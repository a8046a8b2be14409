package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational building blocks. Each helper stays declarative
  * (DataFrame API only) so Catalyst keeps predicate pushdown, column
  * pruning, join selection and whole-stage codegen. Money math goes
  * through exact decimals (SURVEY §7.3: float agg order breaks
  * hash-compares) and is cast back to double at the output boundary.
  */
object Relational {

  /** Exact-sum helper: cast to decimal before summing so the result is
    * independent of partitioning/merge order, then back to double. */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Order-insensitive average with bounded output precision. */
  def avgExact(c: Column, scale: Int = 2, outScale: Int = 6): Column =
    round(sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(c), outScale)

  /** TPC-H style revenue expression: extendedprice * (1 - discount),
    * snapped to an exact decimal per row before aggregation. */
  def revenue(price: Column, discount: Column): Column =
    (price * (lit(1.0) - discount)).cast("decimal(18,4)")

  /** Top-k rows per group, deterministic via explicit tie-break keys.
    * Plans as one shuffle + in-partition sort (no global sort). */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Global top-k — Spark plans TakeOrderedAndProject (no full sort at
    * scale; per-partition heaps + driver merge of k rows). */
  def topK(df: DataFrame, orderCols: Seq[Column], k: Int): DataFrame =
    df.orderBy(orderCols: _*).limit(k)

  /** Keys present in `in` (semi) — e.g. customers that have orders. */
  def semiJoin(df: DataFrame, in: DataFrame, keys: Seq[String]): DataFrame =
    df.join(in, keys, "left_semi")

  /** Keys absent from `notIn` (anti) — the reference's new-file
    * detection shape (main.py:91-95). */
  def antiJoin(df: DataFrame, notIn: DataFrame, keys: Seq[String]): DataFrame =
    df.join(notIn, keys, "left_anti")

  /** Running aggregate over an ordered per-key frame. */
  def runningSum(df: DataFrame, key: Column, order: Seq[Column],
                 value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(value).over(w))
  }
}
