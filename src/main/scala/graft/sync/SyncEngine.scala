package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import graft.catalog.ConfiguredCatalog
import graft.sources.AirbyteSource
import graft.state.StateStore

/** The sync orchestrator — the Spark re-expression of the reference's
  * `sync_all` (reference `tap_airbyte/tap.py:781-902`): select streams,
  * read, apply stream maps + flattening, sink, commit bookmarks.
  *
  * Where the reference demultiplexes one stdout pipe into per-stream
  * in-memory queues drained by daemon threads (its documented scalability
  * limit: a slow consumer ⇒ unbounded memory, `tap.py:811`), here each
  * stream is a DataFrame job — backpressure, parallelism, and spill are
  * Spark's problem. Per-stream jobs are independent and can run concurrently
  * from the driver; within a job, Spark parallelizes across partitions.
  */
final class SyncEngine(
    source: AirbyteSource,
    streamMaps: Map[String, StreamMaps.StreamMap] = Map.empty,
    flattening: Option[Int] = None) {

  /** Full sync: returns the transformed DataFrame per selected stream and
    * updates `state` with the max-cursor bookmark for incremental streams
    * (the batch analog of folding Airbyte STATE messages, tap.py:819-884).
    */
  def sync(
      spark: SparkSession,
      selected: String => Boolean,
      replicationMethod: String => String = _ => "FULL_TABLE",
      state: StateStore = new StateStore()): Map[String, DataFrame] = {
    val catalog = source.discover(spark)
    val configured = ConfiguredCatalog.configure(catalog, selected, replicationMethod)
    val raw = source.read(spark, configured, state)
    // Base pass: per-stream map (with optional output alias), then
    // duplicates — maps whose `source` points at another stream register a
    // SECOND output over the same scan (stream duplication, SURVEY §2.1
    // #16). Both are pure Column transforms; a duplicated stream shares
    // the source DataFrame lineage, so Spark reuses the scan.
    val base = raw.toSeq.map { case (name, df0) =>
      val m = streamMaps.get(name).filter(_.source.isEmpty)
      val df = m.map(StreamMaps(df0, _)).getOrElse(df0)
      m.flatMap(_.alias).getOrElse(name) -> df
    }
    val duplicates = streamMaps.collect {
      case (outName, m) if m.source.exists(raw.contains) =>
        outName -> StreamMaps(raw(m.source.get), m)
    }.toSeq
    // An alias or duplicate whose output name lands on another stream's
    // would silently shadow it in the result Map — fail loudly instead
    // (a mis-set alias dropping a whole stream is a data-loss bug).
    val collisions = (base ++ duplicates).groupBy(_._1).filter(_._2.sizeIs > 1).keys
    if (collisions.nonEmpty)
      throw new IllegalArgumentException(
        s"stream map output-name collision(s): ${collisions.mkString(", ")} — " +
          "an alias or duplicated stream resolves to the same output name as another stream")
    val transformed = (base ++ duplicates).toMap.map { case (name, df) =>
      name -> flattening.map(d => StreamMaps.flatten(df, d)).getOrElse(df)
    }
    // Commit bookmarks: one tiny agg per incremental stream (runs on the
    // RAW stream so maps can't hide the cursor). At scale this is a
    // column-pruned scan of just the cursor column.
    configured.filter(_.syncMode == "incremental").foreach { e =>
      e.stream.cursorField.foreach { cursor =>
        val m = raw(e.stream.name).agg(max(col(cursor)).cast("string")).head()
        if (!m.isNullAt(0)) state.setBookmark(e.stream.name, cursor, m.getString(0))
      }
    }
    transformed
  }
}
