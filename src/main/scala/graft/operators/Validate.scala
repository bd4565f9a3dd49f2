package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract checks (dbt-test / Deequ-style): each rule
  * reduces a table to one (constraint, n_violations, passed) row, and
  * [[report]] unions them into the audit table a pipeline gates a 100 TB
  * ingest on.
  *
  * Scale shape: every rule is a scan + aggregate (violation COUNTING, not
  * violation collection — the count is the gate; row-level triage is a
  * separate filtered query once a gate trips). The FK rule is a left-anti
  * join on the key — hash-shuffled on the key like any join, broadcast
  * when the parent's key projection is small. Nothing collects.
  */
object Validate {

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_violations"))

  /** Extra rows per duplicated key tuple: count(*) − count(DISTINCT keys).
    * Null-keyed rows count as violations of a PK (a PK is NOT NULL +
    * UNIQUE), since count(DISTINCT) skips them.
    */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.agg((count(lit(1)) - countDistinct(keys.head, keys.tail: _*))
      .as("n_violations"))

  /** Child rows whose non-null `fk` has no match in parent's `pk`. */
  def foreignKey(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Non-null rows outside [lo, hi] (either bound optional). */
  def inRange(df: DataFrame, c: String, lo: Option[Column], hi: Option[Column]): DataFrame = {
    require(lo.nonEmpty || hi.nonEmpty,
      s"inRange($c): at least one bound is required")
    val out = (lo.map(col(c) < _).toSeq ++ hi.map(col(c) > _).toSeq)
      .reduce(_ || _)
    df.filter(col(c).isNotNull)
      .agg(sum(when(out, 1L).otherwise(0L)).as("n_violations"))
  }

  /** Non-null rows whose value is outside the accepted set. */
  def inSet(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull)
      .agg(sum(when(!col(c).isin(values: _*), 1L).otherwise(0L)).as("n_violations"))

  /** Snapshot diff — the change audit between two versions of a table
    * (the Datafold/data-diff shape): full outer join on the primary key,
    * rows classified added / removed / changed / unchanged, with value
    * comparison null-safe (<=>) per compared column. Violation-counting
    * philosophy as above: the output is per-status counts; row-level
    * triage is a filtered query once the counts look wrong. One key-wise
    * shuffle join, integer outputs.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      pk: String,
      compareCols: Seq[String]): DataFrame = {
    // null-safe key join (<=>): a null-pk row present unchanged in both
    // snapshots must read as unchanged, not as removed + added (the same
    // null-key discipline `unique` documents for PKs)
    val o = oldDf.select(col(pk).as("__pko"),
      struct(compareCols.map(col): _*).as("__o"))
    val n = newDf.select(col(pk).as("__pkn"),
      struct(compareCols.map(col): _*).as("__n"))
    o.join(n, col("__pko") <=> col("__pkn"), "full_outer")
      .select(
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(col("__o") <=> col("__n"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("status")
  }

  /** Union named rules into the audit table:
    * (constraint, n_violations, passed), ordered by constraint name.
    */
  def report(rules: Seq[(String, DataFrame)]): DataFrame =
    rules.map { case (name, r) =>
      r.select(lit(name).as("constraint"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    }.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("constraint")
}
