package graft.cli

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.sources.{CommandBuilder, FileNativeSource}

class CliSpec extends SparkSpec {
  private val m = new ObjectMapper()

  test("buildSource: file config with cursor, options, primary keys") {
    val cfg = m.readTree(
      s"""{"source":{"type":"file","streams":[
            {"name":"events","format":"parquet","path":"$sf/events.parquet",
             "cursor_field":"event_id","primary_key":["event_id"]}]}}""")
    val src = Main.buildSource(cfg).asInstanceOf[FileNativeSource]
    val cat = src.discover(spark)
    assert(cat.streams.head.cursorField.contains("event_id"))
    assert(cat.streams.head.primaryKeys == Seq("event_id"))
  }

  test("catalogJson: Singer catalog shape with replication_key") {
    val cfg = m.readTree(
      s"""{"source":{"type":"file","streams":[
            {"name":"events","format":"parquet","path":"$sf/events.parquet",
             "cursor_field":"event_id"}]}}""")
    val json = Main.catalogJson(spark, Main.buildSource(cfg))
    val cat = m.readTree(json)
    val s = cat.get("streams").get(0)
    assert(s.get("tap_stream_id").asText == "events")
    assert(s.get("replication_key").asText == "event_id")
    assert(s.get("schema").get("properties").has("event_type"))
  }

  test("CommandBuilder: container argv with mounts mirrors docker-run shape") {
    val cmd = CommandBuilder.container(
      image = "airbyte/source-file", tag = "0.5.3",
      mounts = Seq(CommandBuilder.Mount("/host/data", "/data", "ro")))
    assert(cmd == Seq("docker", "run", "--rm", "-i",
      "-v", "/host/data:/data:ro", "airbyte/source-file:0.5.3"))
    assert(CommandBuilder.native("tap-foo") == Seq("tap-foo"))
  }
}
