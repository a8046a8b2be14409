package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: file compaction and clustered writes. At
  * 100 TB the dominant cost of a badly-laid-out table is paid on every
  * downstream read — small-file scheduling overhead, unprunable
  * partitions, row groups whose min/max stats span everything.
  */
object Layout {

  /** Total bytes of the data files under `dir` (Hadoop FS — works for
    * local, HDFS, and object-store paths alike). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // same exclusions as Spark's HiddenFileFilter: _SUCCESS/_metadata
      // and .crc/.hidden siblings are not data
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Compact a parquet directory into ~`targetBytes` files: size the
    * output file count from the observed bytes, coalesce (no shuffle —
    * compaction must not cost a repartition of the data), rewrite.
    * Returns the output file count. Writes to a NEW directory: the
    * swap (rename/retarget) is the caller's transactional step, so a
    * failed compaction never corrupts the live table. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): Int = {
    val wanted = math.max(1L, (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    // coalesce can only shrink — if the table already has fewer
    // partitions than the byte math wants, there is nothing to
    // compact; report the count actually written, not the wish
    val n = math.min(wanted, df.rdd.getNumPartitions).max(1)
    df.coalesce(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Compaction bin-packing PLAN: assign ordered items (files, row
    * groups, partitions — anything with a size) to sequential
    * ~`target`-sized bins via an exclusive running sum:
    * bin = floor(cumsum_before / target). This is the streaming
    * first-fit approximation every table-maintenance service uses to
    * plan rewrite groups — deterministic given the ordering columns
    * (which must form a total order), integer-exact, and replayable by
    * a SQL oracle (q174). The guarantee is exactly: a bin holds less
    * than `target` bytes BEFORE its last item (each item lands in the
    * bin its exclusive cumsum points at, and is never split). An item
    * larger than `target` can therefore co-reside with the small items
    * that preceded it in its bin, and bin ids may skip values after an
    * oversized item (the overflow advances the running sum past whole
    * bins).
    *
    * The running sum is a single window over `orderCols` — acceptable
    * when the item list is domain-bounded (one row per FILE, not per
    * data row; a 100 TB table at 128 MB files is ~800k rows). For
    * per-partition planning, prepend the partition column via
    * `partitionBy` so each directory packs independently and the
    * window never sees a global order. */
  def binPack(items: DataFrame, orderCols: Seq[String], sizeCol: String,
              target: Long, partitionBy: Seq[String] = Nil): DataFrame = {
    require(target > 0, "binPack needs a positive target size")
    val w0 = if (partitionBy.isEmpty)
      org.apache.spark.sql.expressions.Window.orderBy(orderCols.map(col): _*)
    else
      org.apache.spark.sql.expressions.Window
        .partitionBy(partitionBy.map(col): _*)
        .orderBy(orderCols.map(col): _*)
    val w = w0.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    items
      .withColumn("__cum", coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${target}L"))
      .drop("__cum")
  }

  /** Clustered write: hash-distribute rows by the partition column,
    * sort within each task by `sortCols`, write with directory
    * partitioning. Readers then get BOTH pruning levels: directory
    * pruning on the partition column and parquet row-group min/max
    * skipping on the sort columns. */
  def writeClustered(df: DataFrame, dir: String, partitionCol: String,
                     sortCols: Seq[String]): Unit =
    // the partition column leads the sort: partitionBy's writer
    // requires rows ordered by the partition cols and would otherwise
    // insert its own (unstable) sort, destroying the clustering
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
}
