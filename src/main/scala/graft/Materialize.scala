package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** The one materialization seam for every checkpointed intermediate
  * in the query paths (VERDICT r12 item 10).
  *
  * On this harness (single-JVM local mode) the right primitive is
  * `localCheckpoint`: it truncates lineage onto executor-local
  * storage with no external directory and no replication. On a real
  * cluster that same primitive is a durability hazard — one lost
  * executor kills the query with no recompute path. Rather than
  * scatter that decision over ~80 call sites, every site routes
  * through here and a single config flips the storage story:
  *
  *   spark.graft.materialize.mode = local    (default; localCheckpoint)
  *                                | disk     (localCheckpoint DISK_ONLY)
  *                                | reliable (Dataset.checkpoint — needs
  *                                            spark.checkpoint.dir / a
  *                                            SparkContext checkpoint dir)
  *
  * `disk` additionally exists as a per-site call ([[MatOps.materializeDisk]])
  * for corpus-scale frames that must never squat on unified execution
  * memory whatever the mode (the repo's DISK_ONLY policy for
  * corpus-sized intermediates — the r8 dedup_winnow incident).
  */
object Materialize {

  private def mode(ds: Dataset[_]): String =
    ds.sparkSession.conf.get("spark.graft.materialize.mode", "local")

  def apply[T](ds: Dataset[T], eager: Boolean): Dataset[T] = mode(ds) match {
    case "reliable" => ds.checkpoint(eager)
    case "disk"     => ds.localCheckpoint(eager, StorageLevel.DISK_ONLY)
    case _          => ds.localCheckpoint(eager)
  }

  /** DISK_ONLY regardless of mode (reliable still wins): for frames
    * whose size is corpus-scale by construction. */
  def disk[T](ds: Dataset[T], eager: Boolean): Dataset[T] = mode(ds) match {
    case "reliable" => ds.checkpoint(eager)
    case _          => ds.localCheckpoint(eager, StorageLevel.DISK_ONLY)
  }

  /** Release the executor blocks behind a frame materialized here.
    * `Dataset.unpersist` is a no-op for checkpoint RDD blocks (it
    * only unregisters CacheManager plans), so cache owners that
    * checkpoint (e.g. Dedup's candidate cache) free through the
    * underlying RDD instead (ADVICE r12). */
  def free(ds: Dataset[_]): Unit =
    ds.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  implicit class MatOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Materialize under the session's configured mode. */
    def materialize(eager: Boolean): Dataset[T] = Materialize(ds, eager)
    /** Materialize at DISK_ONLY (corpus-scale frames). */
    def materializeDisk(eager: Boolean): Dataset[T] = disk(ds, eager)
  }
}
