package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import graft.catalog.{AirbyteCatalog, ConfiguredCatalog}
import graft.protocol.{AirbyteMessage, AirbyteMessageType}
import graft.state.StateStore

import java.io.{BufferedReader, BufferedWriter, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Subprocess-backed source: an external connector program speaking the
  * Airbyte protocol (JSONL messages on stdout), as the reference wraps
  * (reference `tap_airbyte/tap.py:584-642` runs `connector read --config
  * --catalog [--state]` under `Popen` with kill-on-early-exit and
  * EOF/returncode checks).
  *
  * Spark-first demultiplexing: instead of per-stream in-memory queues +
  * consumer threads (reference `tap.py:793-888`, whose unbounded queues are
  * its known scalability limit), the driver streams the child's stdout ONCE,
  * routing RECORD lines to one spill file per stream (bounded memory: we
  * hold one line at a time), folding STATE into a [[StateStore]], and
  * fail-fasting on TRACE ERROR (reference `tap.py:649-657`). Each spill file
  * then becomes a typed DataFrame via `from_json` with the discovered
  * schema, so downstream transforms are columnar and distributed.
  *
  * Scale note: a single connector process is inherently a single producer —
  * same as the reference. The scale-out path for many connectors/segments is
  * one spill dir per (connector, segment) read in parallel as a multi-file
  * `spark.read`; the per-partition analog is `RDD.pipe`. The demux itself is
  * I/O-bound line routing and never materializes the dataset in memory.
  */
final class SubprocessSource(
    command: Seq[String],
    config: JsonNode,
    workDir: Path) extends AirbyteSource {

  private val mapper = new ObjectMapper()

  override def spec: JsonNode =
    runForMessage(Seq("spec"), AirbyteMessageType.SPEC)
      .flatMap(_.spec).getOrElse(mapper.createObjectNode())

  /** `check --config`: true iff CONNECTION_STATUS.status == SUCCEEDED
    * (reference `tap.py:555-566`).
    */
  override def check(spark: SparkSession): Boolean =
    runForMessage(Seq("check", "--config", writeConfig().toString), AirbyteMessageType.CONNECTION_STATUS)
      .flatMap(_.connectionStatus)
      .exists(cs => Option(cs.get("status")).exists(_.asText == "SUCCEEDED"))

  override def discover(spark: SparkSession): AirbyteCatalog =
    runForMessage(Seq("discover", "--config", writeConfig().toString), AirbyteMessageType.CATALOG)
      .flatMap(_.catalog)
      .map(AirbyteCatalog.fromJson)
      .getOrElse(AirbyteCatalog(Seq.empty))

  override def read(
      spark: SparkSession,
      configured: Seq[ConfiguredCatalog.Entry],
      state: StateStore): Map[String, DataFrame] = {
    val catalogPath = workDir.resolve("catalog.json")
    Files.writeString(catalogPath, ConfiguredCatalog.toJson(configured))
    val args = mutable.Buffer("read", "--config", writeConfig().toString,
      "--catalog", catalogPath.toString)
    if (!state.isEmpty) {
      val statePath = workDir.resolve("state.json")
      state.save(statePath)
      args ++= Seq("--state", statePath.toString)
    }

    val selected = configured.map(_.stream.name).toSet
    val spillDir = Files.createDirectories(workDir.resolve("spill"))
    val writers = mutable.Map.empty[String, BufferedWriter]
    def writerFor(stream: String): BufferedWriter =
      writers.getOrElseUpdate(stream,
        Files.newBufferedWriter(spillDir.resolve(s"$stream.jsonl"), StandardCharsets.UTF_8))

    try {
      runStreaming(args.toSeq) { msg =>
        msg.msgType match {
          case AirbyteMessageType.RECORD =>
            for {
              rec <- msg.record
              stream <- Option(rec.get("stream")).map(_.asText)
              if selected.contains(stream) // consumer-side skip, tap.py:786-788
              data <- Option(rec.get("data"))
            } {
              val w = writerFor(stream)
              w.write(mapper.writeValueAsString(data)); w.newLine()
            }
          case AirbyteMessageType.STATE =>
            msg.state.foreach(state.merge)
          case AirbyteMessageType.LOG => // route to log4j; INFO-level
          case AirbyteMessageType.TRACE =>
            // TRACE ERROR → fail fast with the connector's message (tap.py:649-657)
            msg.trace.filter(t => Option(t.get("type")).exists(_.asText == "ERROR")).foreach { t =>
              throw new RuntimeException(
                s"connector error: ${Option(t.get("error")).map(_.toString).getOrElse(t.toString)}")
            }
          case AirbyteMessageType.CONTROL => // no-op, tap.py:885-886
          case _                          => // unknown → warn-and-continue
        }
      }
    } finally writers.values.foreach(_.close())

    configured.map { entry =>
      val name = entry.stream.name
      val path = spillDir.resolve(s"$name.jsonl")
      val df: DataFrame =
        if (!Files.exists(path)) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], entry.stream.sparkSchema)
        else {
          import spark.implicits._
          // Typed parse with the DISCOVERED schema (not inference): mirrors
          // the reference trusting connector discovery (tap.py:909-913).
          spark.read.textFile(path.toString)
            .select(from_json(col("value"), entry.stream.sparkSchema).as("r"))
            .select("r.*")
        }
      name -> df
    }.toMap
  }

  // -------------------------------------------------------------------

  private def writeConfig(): Path = {
    val p = workDir.resolve("config.json")
    if (!Files.exists(p)) {
      Files.createDirectories(workDir)
      Files.writeString(p, mapper.writeValueAsString(config))
    }
    p
  }

  /** Run the connector with `args`, stream-parse stdout line-by-line.
    * Non-zero exit or early EOF raises with the captured stderr tail
    * (kill-on-early-exit semantics of reference `tap.py:626-642`).
    */
  private def runStreaming(args: Seq[String])(handle: AirbyteMessage => Unit): Unit = {
    val pb = new ProcessBuilder((command ++ args): _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new BufferedReader(new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
    try {
      var line = out.readLine()
      while (line != null) {
        AirbyteMessage.parse(line).foreach(handle)
        line = out.readLine()
      }
      val code = proc.waitFor()
      if (code != 0) {
        val err = new String(proc.getErrorStream.readNBytes(8192), StandardCharsets.UTF_8)
        throw new RuntimeException(s"connector exited $code: $err")
      }
    } catch {
      case e: Throwable =>
        if (proc.isAlive) proc.destroyForcibly()
        throw e
    } finally out.close()
  }

  private def runForMessage(
      args: Seq[String],
      want: AirbyteMessageType.Value): Option[AirbyteMessage] = {
    var found: Option[AirbyteMessage] = None
    runStreaming(args) { msg => if (msg.msgType == want && found.isEmpty) found = Some(msg) }
    found
  }
}
