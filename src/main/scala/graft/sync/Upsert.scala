package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
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

  /** ANSI `MERGE INTO` as a batch step (SQL:2003 14.9; the Delta/Iceberg
    * upsert statement): reconcile a target snapshot against a source in
    * one pass with the standard clause ladder —
    * `WHEN MATCHED AND <deleteWhen> THEN DELETE`,
    * `WHEN MATCHED THEN UPDATE SET <updateSet>`,
    * `WHEN NOT MATCHED THEN INSERT <insertSet>`; target rows without a
    * source match pass through unchanged. Complements [[applyCdc]]:
    * that replays an explicit op-tagged change log, this DERIVES the
    * action from the join and caller conditions (the "merge computed
    * aggregates into a dimension" shape).
    *
    * `deleteWhen`/`updateSet` see the matched row (target + source
    * columns — names must be disjoint, enforced); `insertSet` sees only
    * source columns. PRECONDITION: `source` must be key-unique
    * (aggregate upstream, as the standard MERGE "cardinality
    * violation" rule requires) — a duplicate source key would fan out
    * its target row. Result: the target schema plus an `action` column
    * (`insert` / `update` / `keep`) — deleted keys are absent; callers
    * not wanting provenance drop it.
    *
    * Scale shape: ONE full-outer hash join on the key (broadcast when
    * the source is dim-sized) and a narrow conditional projection — no
    * window, no second pass; the clause ladder is a single codegen
    * CASE.
    */
  def mergeInto(
      target: DataFrame,
      source: DataFrame,
      targetKey: String,
      sourceKey: String,
      deleteWhen: Column,
      updateSet: Map[String, Column],
      insertSet: Map[String, Column]): DataFrame = {
    require(targetKey != sourceKey,
      s"target and source key columns must be named differently " +
        s"(rename one side), both are '$targetKey'")
    val overlap = target.columns.toSet intersect source.columns.toSet
    require(overlap.isEmpty,
      s"target/source column names must be disjoint, overlap: " +
        overlap.toSeq.sorted.mkString(", "))
    require(updateSet.keySet.subsetOf(target.columns.toSet),
      "updateSet must assign only target columns")
    val j = target.join(source, col(targetKey) === col(sourceKey), "full_outer")
    val action = when(col(targetKey).isNull, lit("insert"))
      .when(col(sourceKey).isNull, lit("keep"))
      .when(deleteWhen, lit("delete"))
      .otherwise(lit("update"))
    val outCols = target.columns.toSeq.map { c =>
      if (c == targetKey) coalesce(col(targetKey), col(sourceKey)).as(c)
      else
        when(col("__action") === "insert",
          insertSet.getOrElse(c, lit(null).cast(target.schema(c).dataType)))
          .when(col("__action") === "update", updateSet.getOrElse(c, col(c)))
          .otherwise(col(c)).as(c)
    }
    j.withColumn("__action", action)
      .filter(col("__action") =!= "delete")
      .select(outCols :+ col("__action").as("action"): _*)
  }
}
