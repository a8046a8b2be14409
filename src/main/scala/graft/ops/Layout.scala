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
