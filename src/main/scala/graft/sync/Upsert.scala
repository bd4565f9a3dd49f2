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
}
