package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block hygiene for iterative operators.
  *
  * `localCheckpoint()` materializes a frame into block-manager storage
  * and nothing ever frees those blocks automatically — the frame's
  * lineage is truncated, so the ContextCleaner sees the RDD as still
  * referenced for as long as the DataFrame object is reachable. An
  * iterative operator that checkpoints per round therefore accumulates
  * one dead O(|V|) frame per iteration, and across a many-query
  * session those leaked blocks tax every subsequent job (block-manager
  * pressure + GC). The fix is explicit: once round r+1's checkpoint is
  * materialized it no longer references round r's blocks, so the
  * superseded frame can be unpersisted immediately.
  */
private[graft] object Checkpoints {

  // Spark WARNs on every unpersist of a localCheckpointed RDD ("cannot
  // be recomputed after unpersisting") — here that is the point: the
  // frame is superseded and nothing will ever recompute it. One WARN
  // per freed round frame floods the log (and the driver's captured
  // output tail), so the org.apache.spark.rdd category is raised to
  // ERROR once, on first use.
  private lazy val muteUnpersistWarn: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

  /** Unpersist the block-manager storage behind a frame returned by
    * `Dataset.localCheckpoint()` (or eager `checkpoint()`). Safe ONLY
    * on frames whose analyzed plan IS the checkpoint leaf — the exact
    * value the checkpoint call returned. Calling it on a derived frame
    * would walk to an ancestor's LogicalRDD and free blocks the caller
    * still needs, so this deliberately matches the root node only.
    * Reliable-checkpoint frames (ReliableCheckpointRDD) have no
    * persisted blocks; unpersist is a no-op there. */
  /** For the Bench/Verify mains, whose between-query block sweep also
    * unpersists leaked localCheckpoint frames. */
  def muteWarnings(): Unit = muteUnpersistWarn

  def free(df: DataFrame): Unit = {
    muteUnpersistWarn
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      // a persist()ed frame (e.g. layoutEdges' cached layout): drop its
      // cache entry; a no-op when the exact plan isn't cached
      case _ => df.unpersist(blocking = false)
    }
  }
}
