package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style upsert compaction. The reference's destination mode is a
  * constant "append" (reference `tap.py:105`) — downstream targets are
  * expected to reconcile by primary key. This operator IS that
  * reconciliation as a batch step: keep the LATEST version of each row
  * per primary key (max cursor, deterministic tiebreak), turning an
  * append-only extract log into current-state rows.
  *
  * Scale shape: the rank-1 filter plans as WindowGroupLimit — every task
  * keeps one candidate row per key before the single hash shuffle on the
  * primary key. No join, no second pass.
  */
object Upsert {

  def latestByKey(
      df: DataFrame,
      primaryKeys: Seq[String],
      cursorCol: String,
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    require(primaryKeys.nonEmpty)
    val order = (cursorCol +: tiebreak).map(c => col(c).desc)
    val w = Window.partitionBy(primaryKeys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MERGE semantics as a batch step: apply a CDC change log (upserts +
    * deletes) to a snapshot. The snapshot rows join the log as implicit
    * upserts (their cursor must order BEFORE any change to the same key —
    * true by construction when the snapshot was cut at the log's start);
    * per key the latest entry wins, and keys whose final entry is a delete
    * leave the result entirely.
    *
    * Scale shape: exactly [[latestByKey]]'s — union is free (no shuffle),
    * WindowGroupLimit keeps one candidate per key per task before the
    * single hash shuffle on the primary key, the delete filter is narrow.
    * No join, no second pass; deletes cost nothing extra.
    */
  def applyCdc(
      snapshot: DataFrame,
      changes: DataFrame,
      primaryKeys: Seq[String],
      cursorCol: String,
      opCol: String,
      deleteOp: String = "D",
      upsertOp: String = "U",
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    require(!snapshot.columns.contains(opCol),
      s"snapshot must not carry '$opCol' — it is implicitly all upserts")
    latestByKey(
      snapshot.withColumn(opCol, lit(upsertOp)).unionByName(changes),
      primaryKeys, cursorCol, tiebreak)
      // null-safe: an unknown/NULL op is treated as an upsert, not a
      // silent delete (`=!=` would evaluate null and drop the row)
      .filter(!(col(opCol) <=> lit(deleteOp)))
      .drop(opCol)
  }
}
