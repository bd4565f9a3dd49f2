package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release discipline for localCheckpoint-pinned frames in iterative
  * operators. `Dataset.unpersist` goes through the CacheManager and does
  * NOT touch checkpoint storage (the pinned RDD is persisted at the RDD
  * level by `Dataset.localCheckpoint`), so an iterative loop that relies
  * on it accumulates every round's node-spine-sized RDD in executor
  * storage for the life of the session — probed empirically: one
  * `localCheckpoint(true)` + `Dataset.unpersist(true)` leaves
  * `sc.getPersistentRDDs` at 1.
  *
  * [[release]] reaches the actual pinned RDD through the checkpointed
  * Dataset's plan (a [[LogicalRDD]] over the persisted internal-row RDD)
  * and unpersists it directly. Callers may only release a frame once the
  * rounds that read it are materialized AND the frame is unreachable
  * from the returned plan — after an eager final checkpoint (lineage
  * truncated at the final RDD, so nothing downstream recomputes through
  * released rounds), or after the loop's per-round action when the frame
  * belongs to a superseded round.
  */
object Checkpoints {

  /** The RDD a `Dataset.localCheckpoint` pinned, if `df` is the frame
    * that call returned (its analyzed plan is exactly one LogicalRDD).
    */
  def pinnedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** Unpersist the checkpoint storage behind each frame (non-blocking). */
  def release(dfs: Seq[DataFrame]): Unit =
    dfs.foreach(df => pinnedRdd(df).foreach(_.unpersist(blocking = false)))
}
