package graft.sources.dsv2

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 face of the connector source:
  *
  * {{{
  * spark.read.format("graft-airbyte")
  *   .option("commands", """[["/bin/sh","seg0.sh"],["/bin/sh","seg1.sh"]]""")
  *   .option("stream", "s1")
  *   .schema(recordSchema)          // or .option("json_schema", <JSON Schema>)
  *   .load()
  * }}}
  *
  * Each command segment becomes ONE `InputPartition`, so N connector
  * invocations execute as N Spark tasks streaming their stdout lazily —
  * the same topology as [[graft.sources.PipedConnectorSource]] but through
  * the engine-native connector API, which buys: catalog integration,
  * genuine `SupportsPushDownRequiredColumns` (deselected record fields are
  * never materialized into rows — stream-map projection pushed INTO the
  * source, the DSv2 analog of the reference's stream-granularity
  * selection), and plan visibility (`BatchScan graft-airbyte`).
  */
class AirbyteConnectorDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-airbyte"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("json_schema"))
      .map(graft.schema.JsonSchemaConverter.toStructType)
      .getOrElse(throw new IllegalArgumentException(
        "graft-airbyte: provide .schema(...) or option json_schema"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ConnectorTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = true
}

final class ConnectorTable(schema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-airbyte(${properties.getOrElse("stream", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ConnectorScanBuilder(schema, options.asCaseSensitiveMap().asScala.toMap ++ properties)
}

final class ConnectorScanBuilder(fullSchema: StructType, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  /** Column pruning pushdown: only the requested record fields are parsed
    * into rows on the executors.
    */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    ()
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val mapper = new ObjectMapper()
      val commands: Seq[Seq[String]] = options.get("commands") match {
        case Some(json) =>
          mapper.readTree(json).elements().asScala.map(cmd =>
            cmd.elements().asScala.map(_.asText).toSeq).toSeq
        case None => throw new IllegalArgumentException("graft-airbyte: option commands required")
      }
      JsonRowConverter.validateSupported(required)
      commands.zipWithIndex.map { case (cmd, i) =>
        ConnectorInputPartition(i, cmd, options.getOrElse("stream", ""))
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ConnectorReaderFactory(required)
  }
}

final case class ConnectorInputPartition(index: Int, command: Seq[String], stream: String)
    extends InputPartition

final class ConnectorReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ConnectorPartitionReader(partition.asInstanceOf[ConnectorInputPartition], schema)
}

/** Streams one connector child's stdout, converting RECORD messages of the
  * selected stream to InternalRows of the PRUNED schema — one line in
  * memory at a time, fail-fast on non-zero exit.
  */
final class ConnectorPartitionReader(partition: ConnectorInputPartition, schema: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val proc = new ProcessBuilder(partition.command: _*).start()
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      val line = reader.readLine()
      if (line == null) {
        val code = proc.waitFor()
        if (code != 0)
          throw new RuntimeException(s"connector[${partition.index}] exited $code")
        return false
      }
      try {
        val node = mapper.readTree(line)
        if (node.path("type").asText == "RECORD") {
          val rec = node.get("record")
          if (partition.stream.isEmpty || rec.path("stream").asText == partition.stream)
            current = convert(rec.get("data"))
        } else if (node.path("type").asText == "TRACE" &&
            node.path("trace").path("type").asText == "ERROR") {
          throw new RuntimeException(
            s"connector[${partition.index}] error: ${node.path("trace").path("error")}")
        }
      } catch {
        case e: RuntimeException => throw e
        case _: Exception => // undecodable line: warn-and-skip semantics
      }
    }
    true
  }

  private def convert(data: JsonNode): InternalRow =
    JsonRowConverter.toInternalRow(data, schema)

  override def get(): InternalRow = current

  override def close(): Unit = {
    reader.close()
    if (proc.isAlive) { proc.destroyForcibly(); () }
  }
}
