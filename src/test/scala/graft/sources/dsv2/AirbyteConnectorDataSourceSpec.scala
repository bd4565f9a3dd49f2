package graft.sources.dsv2

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class AirbyteConnectorDataSourceSpec extends SparkSpec {

  private def fakeSegment(seg: Int, rows: Range): Seq[String] = {
    val dir = Files.createTempDirectory(s"dsv2seg$seg")
    val script = dir.resolve("c.sh")
    val lines = rows.map(i =>
      s"""echo '{"type":"RECORD","record":{"stream":"s1","data":{"id":$i,"seg":$seg,"name":"row$i","score":${i * 1.5}}}}'""")
    Files.writeString(script, ("#!/bin/sh" +: lines).mkString("\n") + "\n")
    script.toFile.setExecutable(true)
    Seq("/bin/sh", script.toString)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("seg", IntegerType),
    StructField("name", StringType), StructField("score", DoubleType)))

  private def commandsJson(cmds: Seq[Seq[String]]): String =
    cmds.map(_.map(c => "\"" + c + "\"").mkString("[", ",", "]")).mkString("[", ",", "]")

  test("format(graft-airbyte): N segments read as N partitions with typed rows") {
    val cmds = Seq(fakeSegment(0, 1 to 4), fakeSegment(1, 5 to 7))
    val df = spark.read.format("graft-airbyte")
      .option("commands", commandsJson(cmds))
      .option("stream", "s1")
      .schema(schema)
      .load()
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 7)
    assert(rows.head.getLong(0) == 1L && rows.head.getString(2) == "row1")
    assert(rows.last.getDouble(3) == 10.5)
  }

  test("column pruning pushes into the source (ReadSchema carries only selected fields)") {
    val cmds = Seq(fakeSegment(2, 1 to 3))
    val df = spark.read.format("graft-airbyte")
      .option("commands", commandsJson(cmds))
      .option("stream", "s1")
      .schema(schema)
      .load()
      .select("id") // prune to one column
    val plan = df.queryExecution.executedPlan.toString
    assert(df.schema.fieldNames.toSeq == Seq("id"))
    // DSv2 BatchScan prints its (pruned) output attributes inline:
    // `BatchScan graft-airbyte(s1)[id#N]` — name/seg/score must not appear
    val scanLine = plan.linesIterator.find(_.contains("BatchScan graft-airbyte")).getOrElse("")
    assert(scanLine.contains("[id#"), s"pruning not pushed:\n$plan")
    assert(!scanLine.contains("name#") && !scanLine.contains("score#"),
      s"unpruned columns reached the scan:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("schema can come from a JSON Schema option (discovery-shaped)") {
    val cmds = Seq(fakeSegment(3, 1 to 2))
    val df = spark.read.format("graft-airbyte")
      .option("commands", commandsJson(cmds))
      .option("stream", "s1")
      .option("json_schema",
        """{"type":"object","properties":{"id":{"type":["null","integer"]},"name":{"type":["null","string"]}}}""")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
  }
}
