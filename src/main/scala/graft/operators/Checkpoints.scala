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

  private val statsCap = BigInt(Long.MaxValue)

  /** `localCheckpoint` with the carried size ESTIMATE clamped.
    *
    * Spark 4's `Dataset.localCheckpoint` truncates the plan to a
    * [[LogicalRDD]] but forwards the origin plan's `Statistics`
    * (`originStats`) through the checkpoint. In an iterative operator
    * that is a time bomb: each round's plan joins the previous pin
    * against itself, size estimates MULTIPLY (`SizeInBytesOnlyStats
    * PlanVisitor` takes the product of join children), and the carried
    * BigInt doubles in BIT LENGTH per round — after k rounds the
    * estimate is a 63·2^k-bit number, and merely COMPUTING the next
    * round's stats does Karatsuba/Toom-Cook products that freeze the
    * driver (measured: boruvkaMsf at sf0.01 planned round-2 labels for
    * 16+ minutes on ~10⁶-bit integers; single loops like minLabel stay
    * ≤ ~4·10³ bits only because they converge in few rounds).
    *
    * The clamp caps `sizeInBytes` / `rowCount` at `Long.MaxValue`.
    * Below the cap the carried estimate passes through UNTOUCHED, so
    * broadcast-by-size decisions on small pinned frames are identical;
    * above it every value behaves the same anyway (nothing past the
    * broadcast threshold is size-sensitive), so collapsing to the cap
    * changes no plan — it only bounds the arithmetic. Every iterative
    * loop should pin through here rather than bare `localCheckpoint`.
    */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    clampCarriedStats(df.localCheckpoint(eager))

  /** Re-wrap `df` (a checkpoint-returned frame) with its carried
    * statistics clamped to [[statsCap]]; identity when already sane.
    * Output attributes, the pinned RDD, partitioning, and ordering are
    * preserved — only the runaway estimate is replaced.
    */
  def clampCarriedStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        val s = l.stats
        if (s.sizeInBytes <= statsCap && s.rowCount.forall(_ <= statsCap)) df
        else {
          val clamped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = s.sizeInBytes.min(statsCap),
            rowCount = s.rowCount.map(_.min(statsCap)))
          val session = df.sparkSession
            .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(session,
            LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
              l.isStreaming, l.stream)(session, Some(clamped), None))
        }
      case _ => df
    }

  /** Unpersist the checkpoint storage behind each frame (non-blocking). */
  def release(dfs: Seq[DataFrame]): Unit =
    dfs.foreach(df => pinnedRdd(df).foreach(_.unpersist(blocking = false)))

}
