package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch namespace for the layout-lifecycle queries (q285/q286/q288
  * and the ANN index lifecycle) that WRITE tables/directories as part
  * of the query. The namespace is keyed by BOTH the Spark application
  * id and the data-dir argument, so concurrent sessions (a bench and a
  * verify at different scale factors) never share a path — two runs
  * racing on one fixed dir could read cross-contaminated data or fail
  * `saveAsTable` on the overwrite. Within one session the namespace is
  * stable, so overwrite-mode reruns stay idempotent (pinned in
  * Round6tSpec).
  */
object Scratch {

  private def sanitize(x: String): String =
    x.replaceAll("[^A-Za-z0-9]+", "_")

  /** App-id-keyed namespaces never collide, but they also never get
    * overwritten by later sessions, so /tmp would grow one namespace
    * per bench/verify/test session forever. Reap sibling namespaces
    * older than a day ONCE per JVM: a concurrent run's directory is
    * minutes old and survives; only long-dead sessions' leftovers go. */
  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val StaleMs = 24L * 3600 * 1000
  private def sweepStale(s: SparkSession): Unit =
    if (swept.compareAndSet(false, true)) {
      val root = new org.apache.hadoop.fs.Path("/tmp/graft_scratch_wh")
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        if (System.currentTimeMillis() - st.getModificationTime > StaleMs)
          try fs.delete(st.getPath, true) catch { case _: Exception => () }
      }
    }

  /** Stable per-(application, data-dir) tag, e.g. `sf0_1_local_17...`. */
  def tag(s: SparkSession, d: String): String = {
    val dataTag = sanitize(new java.io.File(d).getName)
    val appTag = sanitize(s.sparkContext.applicationId)
    s"${dataTag}_$appTag"
  }

  /** Root scratch directory for this (application, data-dir). */
  def dir(s: SparkSession, d: String): String = {
    sweepStale(s)
    s"/tmp/graft_scratch_wh/${tag(s, d)}"
  }

  /** Scratch database for managed layout tables (bucketed writes);
    * created idempotently at a location inside [[dir]]. */
  def db(s: SparkSession, d: String): String = {
    val name = s"graft_tmp_${tag(s, d)}"
    s.sql(s"CREATE DATABASE IF NOT EXISTS $name " +
      s"LOCATION '${dir(s, d)}/wh'")
    name
  }

  /** Drop a managed table AND delete any stale directory left behind
    * by a crashed run with no metastore entry (saveAsTable refuses to
    * reuse the location otherwise). */
  def reset(s: SparkSession, d: String, table: String): Unit = {
    val name = db(s, d)
    s.sql(s"DROP TABLE IF EXISTS $name.$table")
    val p = new org.apache.hadoop.fs.Path(s"${dir(s, d)}/wh/$table")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
