package graft.sync

import graft.SparkSpec
import graft.state.StateStore
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

import scala.collection.mutable.ArrayBuffer

class SingerSinkSpec extends SparkSpec {
  import spark.implicits._
  private val m = new ObjectMapper()

  test("coerce: timestamps ISO-8601, decimals to double, binary to string") {
    val df = Seq(1).toDF("i").select(
      lit("2024-01-01 12:34:56").cast("timestamp").as("ts"),
      lit(BigDecimal("1.50")).as("d"),
      lit("abc").cast("binary").as("b"))
    val out = SingerSink.coerce(df).head()
    assert(out.getString(0).startsWith("2024-01-01T12:34:56"))
    assert(out.getDouble(1) == 1.5)
    assert(out.getString(2) == "abc")
  }

  test("full emission: SCHEMA, ordered RECORDs, final STATE — golden protocol shape") {
    val df = Seq((2L, "b"), (1L, "a")).toDF("id", "name")
    val state = new StateStore()
    state.setBookmark("s1", "id", "2")
    val lines = ArrayBuffer.empty[String]
    SingerSink.emit("s1", df, Seq("id"), state, lines += _, orderBy = Seq("id"))

    assert(lines.size == 4) // 1 SCHEMA + 2 RECORD + 1 STATE
    val schema = m.readTree(lines.head)
    assert(schema.get("type").asText == "SCHEMA")
    assert(schema.get("stream").asText == "s1")
    assert(schema.get("key_properties").get(0).asText == "id")
    assert(schema.get("schema").get("properties").has("name"))

    val rec1 = m.readTree(lines(1))
    assert(rec1.get("type").asText == "RECORD")
    assert(rec1.get("record").get("id").asLong == 1L) // ordered emission
    assert(rec1.has("time_extracted"))

    val st = m.readTree(lines.last)
    assert(st.get("type").asText == "STATE")
    assert(st.get("value").has("airbyte_state"))
  }

  test("downstream close mid-emit ends the sync cleanly; state survives") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val state = new StateStore()
    state.setBookmark("s1", "id", "3")
    val lines = ArrayBuffer.empty[String]
    // consumer dies after 2 lines (SCHEMA + 1 RECORD) — broken pipe
    val completed = SingerSink.emit("s1", df, Seq("id"), state, { l =>
      if (lines.size >= 2) throw new java.io.IOException("Broken pipe")
      lines += l
      ()
    }, orderBy = Seq("id"))
    assert(!completed)   // signalled, not thrown
    assert(lines.size == 2)
    // state is still intact and saveable — the --state-out path works
    val p = java.nio.file.Files.createTempFile("state", ".json")
    state.save(p)
    assert(StateStore.load(p).bookmark("s1", "id").contains("3"))
  }

  test("record lines are valid JSONL with stable values") {
    val df = Seq((1L, 2.5, "x")).toDF("id", "v", "s")
    val line = SingerSink.recordLines("t", df, "1970-01-01T00:00:00Z").head()
    val n = m.readTree(line)
    assert(n.get("record").get("v").asDouble == 2.5)
    assert(n.get("time_extracted").asText == "1970-01-01T00:00:00Z")
  }
}
