package graft.cli

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import graft.catalog.ConfiguredCatalog
import graft.schema.JsonSchemaConverter
import graft.sources.{AirbyteSource, FileNativeSource, SubprocessSource}
import graft.state.StateStore
import graft.sync.{SingerSink, StreamMaps, SyncEngine}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CLI entry points (reference `tap_airbyte/tap.py:211-311`):
  *
  * {{{
  * graft.cli.Main --config c.json [--discover | --test | --about]
  *                [--state s.json] [--state-out s.json] [--out dir]
  * }}}
  *
  * Config shape (our own, JSON):
  * {{{
  * { "source": {
  *     "type": "file",                      // or "subprocess"
  *     "streams": [{"name":"events","format":"parquet","path":"...",
  *                  "cursor_field":"event_id"}],
  *     // subprocess variant:
  *     "command": ["connector-binary"], "connector_config": { ... }
  *   },
  *   "select": ["events"],                  // omit = all streams
  *   "replication_method": {"events": "INCREMENTAL"},
  *   "flattening_max_depth": 2,             // omit = no flattening
  *   "stream_maps": {"events": {"filter": "value > 0",
  *     "computed": {"v2": "value * 2"}, "renames": {"user_id": "uid"},
  *     "drops": ["props"]}} }
  * }}}
  *
  * Default action is a full sync: Singer SCHEMA/RECORD/STATE JSONL on
  * stdout (or parquet per stream under --out), wall-clock + per-stream
  * counts logged at the end (reference `tap.py:792, 899-902`).
  */
object Main {
  private val mapper = new ObjectMapper()

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList)
    val configPath = opts.getOrElse("config",
      sys.error("--config <file> is required"))
    val config = mapper.readTree(Files.readString(Paths.get(configPath)))
    val source = buildSource(config)

    lazy val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    try {
      if (opts.contains("about")) {
        println(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(source.spec))
      } else if (opts.contains("test")) {
        val ok = source.check(spark)
        println(if (ok) "Connection test passed." else "Connection test failed.")
        if (!ok) sys.exit(1)
      } else if (opts.contains("discover")) {
        println(catalogJson(spark, source))
      } else {
        sync(spark, source, config, opts)
      }
    } finally if (opts.exists(o => Set("test", "discover").contains(o._1)) || !opts.contains("about"))
      spark.stop()
  }

  private def parseArgs(args: List[String]): Map[String, String] = args match {
    case Nil => Map.empty
    case flag :: rest if flag.startsWith("--") =>
      val key = flag.drop(2)
      rest match {
        case v :: tail if !v.startsWith("--") => parseArgs(tail) + (key -> v)
        case _                                => parseArgs(rest) + (key -> "")
      }
    case _ :: rest => parseArgs(rest)
  }

  private[cli] def buildSource(config: JsonNode): AirbyteSource = {
    val src = config.get("source")
    src.path("type").asText("file") match {
      case "file" =>
        val streams = src.get("streams").elements().asScala.map { s =>
          FileNativeSource.FileStream(
            name = s.get("name").asText,
            format = s.path("format").asText("parquet"),
            path = s.get("path").asText,
            options = Option(s.get("options")).map(_.properties().asScala
              .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty),
            cursorField = Option(s.get("cursor_field")).filterNot(_.isNull).map(_.asText),
            primaryKeys = Option(s.get("primary_key")).toSeq
              .flatMap(_.elements().asScala.map(_.asText)))
        }.toSeq
        new FileNativeSource(streams)
      case "subprocess" =>
        new SubprocessSource(
          command = src.get("command").elements().asScala.map(_.asText).toSeq,
          config = Option(src.get("connector_config"): JsonNode)
            .getOrElse(mapper.createObjectNode()),
          workDir = Files.createTempDirectory("graft-connector"))
      case other => sys.error(s"unknown source type: $other")
    }
  }

  /** Singer-style catalog document from discovery. */
  private[cli] def catalogJson(spark: SparkSession, source: AirbyteSource): String = {
    val cat = source.discover(spark)
    val root = mapper.createObjectNode()
    val arr = root.putArray("streams")
    cat.streams.foreach { s =>
      val n = arr.addObject()
      n.put("tap_stream_id", s.name)
      n.put("stream", s.name)
      n.set[JsonNode]("schema", s.jsonSchema)
      val kp = n.putArray("key_properties")
      s.primaryKeys.foreach(kp.add)
      s.cursorField.foreach(c => n.put("replication_key", c))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def sync(
      spark: SparkSession,
      source: AirbyteSource,
      config: JsonNode,
      opts: Map[String, String]): Unit = {
    val t0 = System.nanoTime()
    val selected: String => Boolean = Option(config.get("select")) match {
      case Some(sel) if sel.isArray =>
        val set = sel.elements().asScala.map(_.asText).toSet
        set.contains(_)
      case _ => _ => true
    }
    val replication: String => String = Option(config.get("replication_method")) match {
      case Some(r) if r.isObject => name => r.path(name).asText("FULL_TABLE")
      case _                     => _ => "FULL_TABLE"
    }
    val maps: Map[String, StreamMaps.StreamMap] = Option(config.get("stream_maps")) match {
      case Some(ms) if ms.isObject =>
        ms.properties().asScala.map { e =>
          val v = e.getValue
          e.getKey -> StreamMaps.StreamMap(
            filter = Option(v.get("filter")).map(_.asText),
            computed = Option(v.get("computed")).toSeq.flatMap(_.properties().asScala
              .map(c => c.getKey -> c.getValue.asText)),
            renames = Option(v.get("renames")).map(_.properties().asScala
              .map(r => r.getKey -> r.getValue.asText).toMap).getOrElse(Map.empty),
            drops = Option(v.get("drops")).toSeq.flatMap(_.elements().asScala.map(_.asText)))
        }.toMap
      case _ => Map.empty
    }
    val flattening = Option(config.get("flattening_max_depth")).map(_.asInt)

    val state = opts.get("state").map(p => StateStore.load(Paths.get(p)))
      .getOrElse(new StateStore())
    val engine = new SyncEngine(source, maps, flattening)
    val dfs = engine.sync(spark, selected, replication, state)

    val catalog = source.discover(spark)
    val counts = dfs.toSeq.sortBy(_._1).map { case (name, df) =>
      opts.get("out") match {
        case Some(dir) =>
          df.write.mode("overwrite").parquet(s"$dir/$name")
          name -> df.count()
        case None =>
          var n = 0L
          SingerSink.emit(name, df,
            catalog.stream(name).map(_.primaryKeys).getOrElse(Seq.empty),
            state, { l => println(l); if (l.contains("\"RECORD\"")) n += 1 })
          name -> n
      }
    }
    opts.get("state-out").foreach(p => state.save(Paths.get(p)))
    val secs = (System.nanoTime() - t0) / 1e9
    // timing/cost report (tap.py:792, 899-902 analog) — stderr, not stdout,
    // so the Singer stream stays machine-readable
    counts.foreach { case (name, n) => System.err.println(f"[graft] stream $name: $n%d records") }
    System.err.println(f"[graft] Synced ${counts.size}%d streams in $secs%.2f seconds.")
  }
}
