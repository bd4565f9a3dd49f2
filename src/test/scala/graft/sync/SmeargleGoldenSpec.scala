package graft.sync

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.SparkSpec
import graft.catalog.ConfiguredCatalog
import graft.sources.SubprocessSource
import graft.state.StateStore

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Replay of the reference's OTHER golden fixture:
  * `tests/fixtures/SMEARGLE.singer` (`tests/test_syncs.py:77-115`) — one
  * deeply nested 46 KB pokemon record (arrays of objects three levels
  * deep, an empty array, explicit nulls, a property name with a trailing
  * space) synced through the engine's connector path: a subprocess
  * emitting the Airbyte protocol → SubprocessSource demux → typed
  * `from_json` with the discovered schema → SingerSink `to_json`.
  *
  * Two documented impedances of a schema-typed engine (Catalyst structs —
  * the same holds for any columnar engine) are normalized before the deep
  * comparison; everything else — every nested value, int-vs-string
  * fidelity, empty arrays, the trailing-space field name — is compared
  * verbatim:
  *   1. absent vs explicit null: a struct field is always
  *      present-and-nullable, so the fixture's distinction between
  *      `is_default ` (declared, missing from the record) and
  *      `sprites.back_female` (explicitly null) can't round-trip —
  *      null-valued keys are stripped from both sides;
  *   2. schema-undeclared fields: the pokeapi connector's catalog does
  *      not declare `sprites.versions`/`sprites.other` yet emits them;
  *      the reference forwards records raw (its schema is advisory),
  *      a typed engine projects to the declared schema — the golden
  *      record is projected through the declared schema before comparing,
  *      so the assertion pins "everything the schema declares
  *      round-trips verbatim", which is the engine's actual contract.
  * The reference's own test compares RECORD lines only; SCHEMA is
  * asserted structurally here too.
  */
class SmeargleGoldenSpec extends SparkSpec {
  private val m = new ObjectMapper()
  private val fixturePath = "/root/reference/tests/fixtures/SMEARGLE.singer"

  /** Recursively drop null-valued object fields (see scaladoc). */
  private def stripNulls(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = m.createObjectNode()
      o.properties().asScala.foreach { e =>
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, stripNulls(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = m.createArrayNode()
      a.elements().asScala.foreach(e => out.add(stripNulls(e)))
      out
    case other => other
  }

  /** Project a value through its declared JSON schema: objects WITH
    * declared properties keep only those (recursing); free-form objects,
    * arrays without items, and scalars pass through untouched.
    */
  private def projectToSchema(v: JsonNode, schema: JsonNode): JsonNode = v match {
    case o: ObjectNode =>
      val props = if (schema == null) null else schema.get("properties")
      if (props == null || !props.fieldNames().hasNext) o
      else {
        val out = m.createObjectNode()
        o.properties().asScala.foreach { e =>
          if (props.has(e.getKey))
            out.set[JsonNode](e.getKey, projectToSchema(e.getValue, props.get(e.getKey)))
        }
        out
      }
    case a: ArrayNode =>
      val items = if (schema == null) null else schema.get("items")
      val out = m.createArrayNode()
      a.elements().asScala.foreach(e => out.add(projectToSchema(e, items)))
      out
    case other => other
  }

  /** First structural difference between two trees, as a JSONPath-ish string. */
  private def firstDiff(a: JsonNode, b: JsonNode, path: String): String = {
    if (a == b) return s"$path: EQUAL?"
    (a, b) match {
      case (ao: ObjectNode, bo: ObjectNode) =>
        val ak = ao.fieldNames.asScala.toSet
        val bk = bo.fieldNames.asScala.toSet
        if (ak != bk)
          return s"$path: keys gold-only=${(ak -- bk).take(5)} mine-only=${(bk -- ak).take(5)}"
        ak.toSeq.sorted.iterator
          .map(k => (k, ao.get(k), bo.get(k)))
          .collectFirst { case (k, av, bv) if av != bv => firstDiff(av, bv, s"$path.$k") }
          .getOrElse(s"$path: object differs but all fields equal??")
      case (aa: ArrayNode, ba: ArrayNode) =>
        if (aa.size != ba.size) return s"$path: array size gold=${aa.size} mine=${ba.size}"
        (0 until aa.size).iterator
          .collectFirst { case i if aa.get(i) != ba.get(i) => firstDiff(aa.get(i), ba.get(i), s"$path[$i]") }
          .getOrElse(s"$path: array differs but all elements equal??")
      case _ =>
        s"$path: gold=${a.toString.take(120)} (${a.getNodeType}) mine=${b.toString.take(120)} (${b.getNodeType})"
    }
  }

  test("SMEARGLE nested record round-trips the connector sync verbatim (nulls normalized)") {
    assume(Files.exists(Paths.get(fixturePath)))
    val lines = Files.readAllLines(Paths.get(fixturePath)).asScala.toSeq
    val goldSchema = m.readTree(lines.head)
    val goldRecord = m.readTree(lines(2))
    assert(goldRecord.get("type").asText == "RECORD")

    // Build the Airbyte-protocol replay the connector would have emitted:
    // CATALOG for discover; RECORD + STATE for read (messages in files,
    // cat'ed by the script — no shell quoting of 46 KB JSON).
    val work = Files.createTempDirectory("smeargle")
    val catalogMsg = m.createObjectNode()
    catalogMsg.put("type", "CATALOG")
    val cat = catalogMsg.putObject("catalog")
    val streams = cat.putArray("streams")
    val st = streams.addObject()
    st.put("name", "pokemon")
    st.set[JsonNode]("json_schema", goldSchema.get("schema"))
    st.putArray("supported_sync_modes").add("full_refresh")
    Files.writeString(work.resolve("catalog_msg.json"),
      m.writeValueAsString(catalogMsg) + "\n")

    val recordMsg = m.createObjectNode()
    recordMsg.put("type", "RECORD")
    val rec = recordMsg.putObject("record")
    rec.put("stream", "pokemon")
    rec.set[JsonNode]("data", goldRecord.get("record"))
    val stateMsg = m.readTree(
      """{"type":"STATE","state":{"type":"STREAM","stream":
        |{"stream_descriptor":{"name":"pokemon"},"stream_state":{"synced":true}}}}"""
        .stripMargin.replaceAll("\n", ""))
    Files.writeString(work.resolve("read_msgs.jsonl"),
      m.writeValueAsString(recordMsg) + "\n" + m.writeValueAsString(stateMsg) + "\n")

    val script = work.resolve("conn.sh")
    Files.writeString(script, Seq(
      "#!/bin/sh",
      s"""if [ "$$1" = "discover" ]; then cat "${work.resolve("catalog_msg.json")}"; exit 0; fi""",
      s"""cat "${work.resolve("read_msgs.jsonl")}""""
    ).mkString("\n") + "\n")

    // Engine sync: discover → demux → typed DataFrame → Singer emission.
    val src = new SubprocessSource(
      Seq("/bin/sh", script.toString), m.createObjectNode(), work)
    val discovered = src.discover(spark)
    assert(discovered.streams.map(_.name) == Seq("pokemon"))
    val state = new StateStore()
    val dfs = src.read(spark, ConfiguredCatalog.configure(discovered, _ => true), state)
    val out = ArrayBuffer.empty[String]
    SingerSink.emit("pokemon", dfs("pokemon"), Seq.empty, state, out += _)

    assert(out.size == 3) // SCHEMA + 1 RECORD + final STATE
    val mySchema = m.readTree(out.head)
    val myRecord = m.readTree(out(1))

    // SCHEMA: same stream and exact property-name set (incl. the
    // trailing-space name, which must survive backtick handling).
    assert(mySchema.get("stream").asText == "pokemon")
    assert(
      mySchema.get("schema").get("properties").fieldNames.asScala.toSet ==
        goldSchema.get("schema").get("properties").fieldNames.asScala.toSet)

    // RECORD: deep equality of the full nested payload, nulls normalized
    // on both sides (see scaladoc for why absent-vs-null can't round-trip).
    assert(myRecord.get("type").asText == "RECORD")
    assert(myRecord.get("stream").asText == "pokemon")
    val mine = stripNulls(myRecord.get("record"))
    val gold = stripNulls(
      projectToSchema(goldRecord.get("record"), goldSchema.get("schema")))
    assert(mine == gold, s"nested record diverges at: ${firstDiff(gold, mine, "$")}")

    // The connector's STREAM state was folded into the engine state.
    assert(state.snapshot.toString.contains("\"synced\":true"))
  }
}
