package org.apache.spark.sql

/** Release the storage behind a `localCheckpoint()`ed Dataset.
  *
  * `Dataset.unpersist` goes through the CacheManager, which never
  * registered a localCheckpoint — calling it on checkpointed state is
  * a silent no-op (plus a misleading "cannot be recomputed after
  * unpersisting" log line). The state actually pinned is the
  * `RDD[InternalRow]` inside the checkpoint's `LogicalRDD` leaf; this
  * bridge unpersists THAT, so iterative algorithms (label propagation,
  * PageRank, BPE rounds, Lloyd rounds) genuinely drop superseded
  * per-round state instead of accumulating every round's blocks until
  * a harness-level sweep. Standard extension-library `private[sql]`
  * bridge pattern, same as [[GraftColumnBridge]].
  */
object GraftReleaseBridge {
  /** Unpersist the checkpoint RDD behind `ds`; falls back to the
    * CacheManager path for `.persist()`ed (non-checkpoint) inputs.
    * Non-blocking: release ordering never gates the next round. */
  def release(ds: Dataset[_]): Unit = ds match {
    case d: classic.Dataset[_] =>
      d.queryExecution.analyzed match {
        case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => d.unpersist(blocking = false)
      }
    case other => other.unpersist(blocking = false)
  }
}
