package graft.core

import org.apache.spark.sql.Dataset

/** Materialization barriers with a fault-tolerance switch.
  *
  * Many operators materialize an intermediate frame exactly once so a
  * diamond-shaped DAG (the frame feeds two+ downstream joins) computes
  * it once instead of inlining the whole upstream pipeline into every
  * branch. The default mechanism is a LAZY `localCheckpoint(false)`:
  * blocks live in executor storage, there is no extra job, and the
  * first downstream action materializes them. The trade-off, inventoried
  * in SCALE.md, is fault tolerance: executor-local blocks have no
  * lineage left to recompute from, so on a real multi-executor cluster
  * an executor loss mid-job makes those partitions unrecoverable and
  * fails the job (Spark's own scaladoc for `localCheckpoint` documents
  * this; in `local[N]` mode the distinction is moot — losing the only
  * executor is losing the job).
  *
  * For production 100 TB runs on preemptible/spot capacity, set
  *
  *   spark.conf: `graft.checkpoint.reliable = true`
  *   spark.conf: `graft.checkpoint.dir = <HDFS/S3 path>`  (optional;
  *     a session-scoped /tmp dir otherwise, which is only sensible in
  *     local mode)
  *
  * and every barrier site upgrades to a RELIABLE `checkpoint` — blocks
  * are written to the checkpoint directory and survive executor loss.
  * Semantics are otherwise identical (both truncate lineage and
  * materialize once); CheckpointsSpec pins frame-equality across modes.
  *
  * The reference never faces this choice: its jobs are single-pass
  * Python scripts that re-read HDFS for every intermediate
  * (e.g. condor_utils.py caches to local parquet between steps).
  */
object Checkpoints {

  /** True when the session asks for fault-tolerant barriers. */
  def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.conf
      .getOption("graft.checkpoint.reliable")
      .exists(_.equalsIgnoreCase("true"))

  /** Ensure the SparkContext has a checkpoint dir, creating a
    * session-scoped temp dir when `graft.checkpoint.dir` is unset. */
  private def ensureDir(ds: Dataset[_]): Unit = {
    val sc = ds.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = ds.sparkSession.conf
        .getOption("graft.checkpoint.dir")
        .getOrElse(s"/tmp/graft-checkpoints/${sc.applicationId}")
      sc.setCheckpointDir(dir)
    }
  }

  /** One-time materialization barrier for `ds`: lazy localCheckpoint by
    * default; lazy reliable checkpoint under `graft.checkpoint.reliable`.
    * `eager=true` materializes immediately (used by iterative lineage
    * hygiene, where the barrier must complete before the next round's
    * plan references it). */
  def barrier[T](ds: Dataset[T], eager: Boolean = false): Dataset[T] =
    if (reliable(ds)) { ensureDir(ds); ds.checkpoint(eager) }
    else ds.localCheckpoint(eager)

  /** `.barrier()` chaining syntax so call sites read like the
    * `.localCheckpoint(false)` they replace. */
  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    def barrier(eager: Boolean = false): Dataset[T] =
      Checkpoints.barrier(ds, eager)
  }
}
