package graft.protocol

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Airbyte-protocol and Singer-protocol message envelopes.
  *
  * The reference consumes Airbyte messages (`RECORD, STATE, LOG, TRACE,
  * CATALOG, SPEC, CONNECTION_STATUS, CONTROL` — reference
  * `tap_airbyte/tap.py:87-96`) from a connector subprocess's stdout and
  * re-emits Singer messages (`SCHEMA / RECORD / STATE` JSONL) on its own
  * stdout. We model both sides as small ADTs over Jackson trees — schemas
  * are runtime-discovered so a fully-typed model buys nothing (SURVEY §1.4).
  */
object AirbyteMessageType extends Enumeration {
  val RECORD, STATE, LOG, TRACE, CATALOG, SPEC, CONNECTION_STATUS, CONTROL = Value
}

/** One parsed line of Airbyte-protocol output. `payload` is the full
  * message object; helpers pull the per-type sub-document.
  */
final case class AirbyteMessage(msgType: AirbyteMessageType.Value, payload: JsonNode) {
  def record: Option[JsonNode]  = Option(payload.get("record"))
  def state: Option[JsonNode]   = Option(payload.get("state"))
  def catalog: Option[JsonNode] = Option(payload.get("catalog"))
  def spec: Option[JsonNode]    = Option(payload.get("spec"))
  def connectionStatus: Option[JsonNode] = Option(payload.get("connectionStatus"))
  def log: Option[JsonNode]     = Option(payload.get("log"))
  def trace: Option[JsonNode]   = Option(payload.get("trace"))
}

object AirbyteMessage {
  private val mapper = new ObjectMapper()

  /** Parse one JSONL line; None for blank lines or non-JSON noise (the
    * reference logs-and-skips undecodable lines rather than failing).
    */
  def parse(line: String): Option[AirbyteMessage] = {
    val trimmed = line.trim
    if (trimmed.isEmpty || !trimmed.startsWith("{")) return None
    try {
      val node = mapper.readTree(trimmed)
      val t = node.get("type")
      if (t == null) None
      else {
        val name = t.asText
        AirbyteMessageType.values.find(_.toString == name).map(AirbyteMessage(_, node))
      }
    } catch { case _: Exception => None }
  }
}

/** Singer-side messages the engine emits (reference `tap.py:62-77`,
  * fixture shape `tests/fixtures/KPHX.singer`).
  */
sealed trait SingerMessage { def toJson: String }

object SingerMessage {
  private[protocol] val mapper = new ObjectMapper()

  final case class Schema(stream: String, schema: JsonNode, keyProperties: Seq[String])
      extends SingerMessage {
    def toJson: String = {
      val n: ObjectNode = mapper.createObjectNode()
      n.put("type", "SCHEMA")
      n.put("stream", stream)
      n.set[JsonNode]("schema", schema)
      val kp = n.putArray("key_properties")
      keyProperties.foreach(kp.add)
      mapper.writeValueAsString(n)
    }
  }

  final case class Record(stream: String, record: JsonNode, timeExtracted: Option[String])
      extends SingerMessage {
    def toJson: String = {
      val n: ObjectNode = mapper.createObjectNode()
      n.put("type", "RECORD")
      n.put("stream", stream)
      n.set[JsonNode]("record", record)
      timeExtracted.foreach(n.put("time_extracted", _))
      mapper.writeValueAsString(n)
    }
  }

  final case class State(value: JsonNode) extends SingerMessage {
    def toJson: String = {
      val n: ObjectNode = mapper.createObjectNode()
      n.put("type", "STATE")
      n.set[JsonNode]("value", value)
      mapper.writeValueAsString(n)
    }
  }
}
