package graft.queries

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.catalog.ConfiguredCatalog
import graft.sources.SubprocessSource
import graft.state.StateStore
import graft.streaming.StreamingSync

import java.nio.file.{Files, Path, Paths}

/** The streaming sync path under the DuckDB oracle gate: a bounded
  * connector replay (an Airbyte-protocol child process emitting the nation
  * table as RECORD lines) runs through the engine's REAL topology —
  * SubprocessSource demux → per-stream spill JSONL → checkpointed
  * Structured Streaming sync (`StreamingSync.readJsonlStream` →
  * `syncToParquet`, AvailableNow trigger) → parquet sink — and the sink
  * table is what the driver hash-compares against DuckDB reading the same
  * nation parquet. Batch/stream equivalence, end to end (reference sync
  * loop `tap_airbyte/tap.py:781-902`, re-expressed as micro-batches).
  *
  * The fixture (script + replay JSONL + sink + checkpoint) is keyed by the
  * source parquet's (mtime, size) like Parity.fileSourceStream, with a
  * completion marker written only after the sink row count is verified —
  * a partial prior attempt can never masquerade as a finished sync.
  * Fixture generation collects the 25 nation rows driver-side by design
  * (bounded replay input, not an operator path).
  */
object StreamSync {

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
    }
  }

  private def sinkDir(s: SparkSession, d: String): String = {
    val srcFile = new java.io.File(s"$d/nation.parquet")
    val root = Paths.get(
      s"/tmp/graft_fixtures/stream_sync_${srcFile.lastModified}_${srcFile.length}")
    val marker = root.resolve("_DONE")
    val sink = root.resolve("sink")
    if (!Files.exists(marker)) synchronized {
      if (!Files.exists(marker)) {
        deleteRecursively(root)
        Files.createDirectories(root)

        // 1. Bounded connector replay: one RECORD line per nation row, a
        // discover-able catalog, and a trailing STATE — the protocol shape
        // the reference consumes from a real connector container.
        val rows = Tables.nation(s, d).orderBy("n_nationkey")
          .select(to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey"))).as("j"))
          .collect().map(_.getString(0))
        val records = rows.map(j =>
          s"""{"type":"RECORD","record":{"stream":"nation","data":$j}}""")
        Files.writeString(root.resolve("records.jsonl"), records.mkString("\n") + "\n")
        val catalog =
          """{"streams":[{"name":"nation","json_schema":{"type":"object","properties":{
            |"n_nationkey":{"type":["null","integer"]},
            |"n_name":{"type":["null","string"]},
            |"n_regionkey":{"type":["null","integer"]}}},
            |"supported_sync_modes":["full_refresh"]}]}""".stripMargin.replaceAll("\n", "")
        val script = root.resolve("conn.sh")
        Files.writeString(script, Seq(
          "#!/bin/sh",
          s"""if [ "$$1" = "discover" ]; then echo '{"type":"CATALOG","catalog":$catalog}'; exit 0; fi""",
          s"""cat "${root.resolve("records.jsonl")}"""",
          """echo '{"type":"STATE","state":{"type":"LEGACY","data":{"nation":{"done":true}}}}'"""
        ).mkString("\n") + "\n")

        // 2. Engine demux: connector stdout → spill JSONL (one file/stream).
        val src = new SubprocessSource(
          Seq("/bin/sh", script.toString), new ObjectMapper().createObjectNode(), root)
        val cat = src.discover(s)
        val meta = cat.streams.find(_.name == "nation").getOrElse(
          sys.error("stream_sync replay: connector catalog missing 'nation'"))
        src.read(s, ConfiguredCatalog.configure(cat, _ == "nation"), new StateStore())

        // 3. Checkpointed micro-batch sync of the spill landing dir.
        val q = StreamingSync.syncToParquet(
          StreamingSync.readJsonlStream(s, s"$root/spill/*.jsonl", meta.sparkSchema),
          "nation", sink.toString, root.resolve("ckpt").toString,
          Some("n_nationkey"), new StateStore(), Trigger.AvailableNow())
        q.awaitTermination(120000)

        val n = s.read.parquet(sink.toString).count()
        require(n == rows.length.toLong,
          s"stream_sync sink has $n rows, expected ${rows.length}")
        Files.createFile(marker)
        ()
      }
    }
    sink.toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_sync" -> ((s, d) => {
      s.read.parquet(sinkDir(s, d))
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy("n_nationkey")
    }))

  def oracleSql: Map[String, String] = Map(
    "q_stream_sync" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
         ORDER BY n_nationkey""")
}
