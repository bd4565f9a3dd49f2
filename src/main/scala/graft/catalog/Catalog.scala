package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types.StructType
import graft.schema.JsonSchemaConverter

import scala.jdk.CollectionConverters._

/** One discovered stream: name + schema + replication metadata.
  *
  * Mirrors the reference's per-stream catalog extraction
  * (reference `tap_airbyte/tap.py:904-945`): cursor comes from
  * `cursor_field[0]` or, when `source_defined_cursor` is set,
  * `default_cursor_field[0]`; primary keys from `primary_key[0]` or
  * `source_defined_primary_key[0]` — both are `[[str,...]]` in the Airbyte
  * catalog and only the FIRST key-list is taken.
  */
final case class StreamMeta(
    name: String,
    jsonSchema: JsonNode,
    supportedSyncModes: Seq[String],
    cursorField: Option[String],
    primaryKeys: Seq[String],
    namespace: Option[String] = None) {
  lazy val sparkSchema: StructType = JsonSchemaConverter.toStructType(jsonSchema)
}

/** Replication-method mapping (reference `tap.py:99-105`): Singer methods →
  * Airbyte sync modes; destination mode is a constant no-op "append".
  */
object ReplicationMethod {
  val map: Map[String, String] = Map(
    "FULL_TABLE"  -> "full_refresh",
    "INCREMENTAL" -> "incremental",
    "LOG_BASED"   -> "incremental")
  val destinationSyncMode = "append"
}

final case class AirbyteCatalog(streams: Seq[StreamMeta]) {
  def stream(name: String): Option[StreamMeta] = streams.find(_.name == name)
}

object AirbyteCatalog {
  private val mapper = new ObjectMapper()

  /** Parse an Airbyte `CATALOG` message payload:
    * `{"streams":[{name, json_schema, supported_sync_modes, cursor_field,
    * default_cursor_field, source_defined_cursor, primary_key,
    * source_defined_primary_key, ...}]}`.
    */
  def fromJson(catalog: JsonNode): AirbyteCatalog = {
    val streams = Option(catalog.get("streams")).toSeq
      .flatMap(_.elements().asScala)
      .map { s =>
        def strArr(field: String): Seq[String] =
          Option(s.get(field)).toSeq.flatMap(_.elements().asScala.map(_.asText))
        // [[str,...]] shape: only the first key-list is taken (tap.py:934-943).
        def firstKeyList(field: String): Seq[String] =
          Option(s.get(field)).flatMap(n => n.elements().asScala.nextOption()) match {
            case Some(inner) if inner.isArray => inner.elements().asScala.map(_.asText).toSeq
            case Some(scalar)                 => Seq(scalar.asText)
            case None                         => Seq.empty
          }
        val sourceDefinedCursor = Option(s.get("source_defined_cursor")).exists(_.asBoolean(false))
        val cursor = strArr("cursor_field").headOption.orElse(
          if (sourceDefinedCursor) strArr("default_cursor_field").headOption else None)
        val pks = {
          val explicit = firstKeyList("primary_key")
          if (explicit.nonEmpty) explicit else firstKeyList("source_defined_primary_key")
        }
        StreamMeta(
          name = s.get("name").asText,
          jsonSchema = Option(s.get("json_schema")).getOrElse(mapper.createObjectNode()),
          supportedSyncModes = strArr("supported_sync_modes"),
          cursorField = cursor,
          primaryKeys = pks,
          namespace = Option(s.get("namespace")).map(_.asText))
      }
      .toSeq
    AirbyteCatalog(streams)
  }

  def fromJson(catalog: String): AirbyteCatalog = fromJson(mapper.readTree(catalog))
}

/** Singer catalog DOCUMENT input (`--catalog`, the reference's primary
  * selection mechanism — reference `tap.py:211-311` CLI, consumed at
  * `tap.py:748-774`): a `{"streams":[{tap_stream_id, schema, metadata:
  * [{breadcrumb, metadata}]}]}` document whose metadata entries carry
  * Singer `selected` flags.
  *
  * Selection rules (singer-sdk semantics):
  *   - stream level (breadcrumb `[]`): explicit `selected` wins, else
  *     `selected-by-default`, else selected;
  *     `inclusion: "unsupported"` is never selected.
  *   - field level (breadcrumb `["properties", f]`): explicit
  *     `selected: false` drops the field unless `inclusion: "automatic"`
  *     (key properties and replication keys stay).
  */
object SingerCatalogDoc {
  private val mapper = new ObjectMapper()

  final case class Selection(
      streamSelected: Map[String, Boolean],
      fieldDrops: Map[String, Seq[String]],
      replicationMethod: Map[String, String]) {
    /** Selection predicate: streams absent from the document stay selected
      * (document scopes only what it mentions, like `--catalog` overlaying
      * discovery in the reference).
      */
    def selects(stream: String): Boolean = streamSelected.getOrElse(stream, true)
  }

  def parse(doc: String): Selection = parse(mapper.readTree(doc))

  def parse(doc: JsonNode): Selection = {
    var sel = Map.empty[String, Boolean]
    var drops = Map.empty[String, Seq[String]]
    var repl = Map.empty[String, String]
    Option(doc.get("streams")).toSeq.flatMap(_.elements().asScala).foreach { s =>
      val name = Option(s.get("tap_stream_id")).orElse(Option(s.get("stream")))
        .map(_.asText).getOrElse("")
      val entries = Option(s.get("metadata")).toSeq.flatMap(_.elements().asScala).map { e =>
        val crumb = Option(e.get("breadcrumb")).toSeq
          .flatMap(_.elements().asScala.map(_.asText))
        crumb -> e.path("metadata")
      }
      val streamMeta = entries.collectFirst { case (Seq(), m) => m }
      val streamSelected = streamMeta match {
        case Some(m) if m.path("inclusion").asText("") == "unsupported" => false
        case Some(m) if m.has("selected") => m.get("selected").asBoolean
        case Some(m) if m.has("selected-by-default") =>
          m.get("selected-by-default").asBoolean
        case _ => true
      }
      sel += (name -> streamSelected)
      streamMeta.filter(_.has("replication-method"))
        .foreach(m => repl += (name -> m.get("replication-method").asText))
      val dropped = entries.collect {
        case (Seq("properties", f), m)
            if m.has("selected") && !m.get("selected").asBoolean &&
              m.path("inclusion").asText("") != "automatic" => f
      }
      if (dropped.nonEmpty) drops += (name -> dropped)
    }
    Selection(sel, drops, repl)
  }
}

/** Stream-selection pushdown (reference `tap.py:748-774`): the configured
  * catalog contains ONLY selected streams, so the source never extracts
  * deselected ones — projection pushdown at stream granularity. Each entry
  * carries a sync mode derived from the requested replication method with
  * fallback to the stream's first supported mode on mismatch
  * (reference `tap.py:758-766`).
  */
object ConfiguredCatalog {

  final case class Entry(stream: StreamMeta, syncMode: String, destinationSyncMode: String)

  def configure(
      catalog: AirbyteCatalog,
      selected: String => Boolean,
      replicationMethod: String => String = _ => "FULL_TABLE"): Seq[Entry] =
    catalog.streams.filter(s => selected(s.name)).map { s =>
      val requested = ReplicationMethod.map.getOrElse(replicationMethod(s.name), "full_refresh")
      val mode =
        if (s.supportedSyncModes.isEmpty || s.supportedSyncModes.contains(requested)) requested
        else s.supportedSyncModes.head
      Entry(s, mode, ReplicationMethod.destinationSyncMode)
    }

  private val mapper = new ObjectMapper()

  /** Serialize to the Airbyte configured-catalog wire shape. */
  def toJson(entries: Seq[Entry]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("streams")
    entries.foreach { e =>
      val n: ObjectNode = arr.addObject()
      val s = n.putObject("stream")
      s.put("name", e.stream.name)
      s.set[JsonNode]("json_schema", e.stream.jsonSchema)
      val modes = s.putArray("supported_sync_modes")
      (if (e.stream.supportedSyncModes.nonEmpty) e.stream.supportedSyncModes
       else Seq("full_refresh")).foreach(modes.add)
      n.put("sync_mode", e.syncMode)
      n.put("destination_sync_mode", e.destinationSyncMode)
    }
    mapper.writeValueAsString(root)
  }
}
