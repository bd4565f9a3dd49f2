package graft.sync

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSpec
import graft.sources.FileNativeSource
import graft.state.StateStore

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Replay of the reference's OWN end-to-end fixture: sync
  * `tests/fixtures/KPHX.csv` (365 daily-weather rows) and compare the
  * emitted Singer stream against `tests/fixtures/KPHX.singer` — the
  * reference's strongest offline parity evidence (its method:
  * `tests/test_syncs.py:40-75` — equal line count, then per-line parsed
  * deep equality with volatile `time_extracted` popped from both sides).
  *
  * What this pins beyond shape tests:
  *   - numeric RENDERING: the fixture declares every numeric column as
  *     JSON-Schema `number` (`KPHX.singer:1`) yet emits integer-columns'
  *     values as JSON ints (109, not 109.0) and decimal columns' as floats
  *     (0.0, 0.02) — exactly what Spark CSV inference (int vs double
  *     columns) + `to_json` produce, so every one of the 365×13 values is
  *     compared verbatim;
  *   - envelope framing: 1 SCHEMA + 365 RECORD + 1 final empty STATE
  *     (`{"type":"STATE","value":{}}`), in order, records in file order.
  *
  * SCHEMA is compared structurally (same stream, key_properties, property
  * set, and per-property compatible declared type) rather than verbatim:
  * the fixture's schema is what the `airbyte/source-file` connector's
  * discovery declared — ALL numerics as `number` — while this engine's
  * discovery is Spark inference, which is strictly finer (`integer` for
  * int-only columns). The reference's own test never compares SCHEMA at
  * all (it deep-compares RECORDs only), so this is still stronger.
  */
class KphxGoldenSpec extends SparkSpec {
  private val m = new ObjectMapper()
  private val csvPath = "/root/reference/tests/fixtures/KPHX.csv"
  private val singerPath = "/root/reference/tests/fixtures/KPHX.singer"

  private def scrub(n: JsonNode): JsonNode = {
    n match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o.remove("time_extracted")
      case _ =>
    }
    n
  }

  test("KPHX.csv syncs line-for-line to the reference's KPHX.singer fixture") {
    assume(Files.exists(Paths.get(csvPath)) && Files.exists(Paths.get(singerPath)))

    // The connector's discovery typed `date` as a plain string
    // ("2014-7-1"); Spark 4's lenient default timestamp formatter would
    // otherwise promote it to TIMESTAMP and re-render it ISO-formatted.
    // preferDate=false kills date inference; the explicit (strict)
    // timestamp formats reject "2014-7-1" so inference falls to string.
    val source = new FileNativeSource(Seq(
      FileNativeSource.FileStream("test", "csv", csvPath,
        options = Map(
          "preferDate" -> "false",
          "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]",
          "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss[.SSS]"))))
    val engine = new SyncEngine(source)
    val state = new StateStore()
    val dfs = engine.sync(spark, _ == "test", _ => "FULL_TABLE", state)

    val lines = ArrayBuffer.empty[String]
    // coalesce(1): the fixture's record order is file order; a single
    // partition pins Spark's CSV read to it regardless of split planning.
    SingerSink.emit("test", dfs("test").coalesce(1), Seq.empty, state, lines += _)

    val golden = Files.readAllLines(Paths.get(singerPath)).asScala.toSeq

    // The reference's first gate: identical line count (367).
    assert(lines.size == golden.size,
      s"expected ${golden.size} singer lines, got ${lines.size}")

    val parsedMine = lines.map(l => scrub(m.readTree(l)))
    val parsedGold = golden.map(l => scrub(m.readTree(l)))

    // SCHEMA (line 0): structural parity vs the connector-declared schema.
    val (sMine, sGold) = (parsedMine.head, parsedGold.head)
    assert(sMine.get("type").asText == "SCHEMA" && sGold.get("type").asText == "SCHEMA")
    assert(sMine.get("stream").asText == sGold.get("stream").asText)
    assert(sMine.get("key_properties").size == 0 && sGold.get("key_properties").size == 0)
    val pMine = sMine.get("schema").get("properties")
    val pGold = sGold.get("schema").get("properties")
    assert(pMine.fieldNames.asScala.toSet == pGold.fieldNames.asScala.toSet)
    pGold.fieldNames.asScala.foreach { f =>
      val declared = pGold.get(f).get("type").elements.asScala.map(_.asText).toSet - "null"
      val mine     = pMine.get(f).get("type").elements.asScala.map(_.asText).toSet - "null"
      // integer is a refinement of the connector's blanket `number`
      val widened = if (mine == Set("integer")) Set("number") else mine
      assert(widened == declared, s"property $f: declared $declared, emitted $mine")
    }

    // RECORDs (lines 1..365): the reference's deep-equality loop, but over
    // the WHOLE envelope (type + stream + record), not just `record`.
    (1 until golden.size - 1).foreach { i =>
      assert(parsedMine(i) == parsedGold(i),
        s"line $i diverges:\n  golden: ${parsedGold(i)}\n  mine:   ${parsedMine(i)}")
    }

    // Final STATE: a full-refresh sync ends with the empty-state envelope.
    assert(parsedMine.last == parsedGold.last,
      s"STATE diverges: golden ${parsedGold.last}, mine ${parsedMine.last}")
  }
}
