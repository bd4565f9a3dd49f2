package graft.sources.dsv2

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
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
  * selection), best-effort `SupportsPushDownFilters` (supported
  * predicates drop rows at the connector boundary before row conversion;
  * Spark re-applies every filter post scan, so the early drop can never
  * change results), and plan visibility (`BatchScan graft-airbyte`).
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
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Column pruning pushdown: only the requested record fields are parsed
    * into rows on the executors.
    */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    ()
  }

  /** Filter pushdown, BEST-EFFORT: supported predicates are evaluated on
    * the raw JSON record in the partition reader, so non-matching rows
    * are dropped at the connector boundary before row conversion. Every
    * filter is also RETURNED as residual — Spark re-applies them post
    * scan — so the source-side drop is purely an optimization and a
    * mismatch between the JSON-level and Catalyst-level evaluation can
    * never change results (the conservative contract the parquet source
    * uses for its own pushdown).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(ConnectorFilterEval.supported(fullSchema))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-airbyte stream=${options.getOrElse("stream", "")} " +
        s"PushedFilters: [${pushed.mkString(", ")}]"

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
        ConnectorInputPartition(i, cmd, options.getOrElse("stream", ""), pushed.toSeq)
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ConnectorReaderFactory(required)
  }
}

/** JSON-level evaluation of pushed filters — the executor-side half of the
  * best-effort pushdown. `supported` admits only top-level fields compared
  * to string/number/boolean literals (exactly what a Singer RECORD carries
  * at depth 1); `eval` follows SQL three-valued logic: a missing or null
  * field fails every comparison (Spark's residual filter would drop the
  * row anyway, so dropping it early is always safe).
  */
object ConnectorFilterEval {
  def supported(schema: StructType)(f: Filter): Boolean = f match {
    case EqualTo(a, v)            => simple(schema, a, v)
    case GreaterThan(a, v)        => simple(schema, a, v)
    case GreaterThanOrEqual(a, v) => simple(schema, a, v)
    case LessThan(a, v)           => simple(schema, a, v)
    case LessThanOrEqual(a, v)    => simple(schema, a, v)
    case IsNotNull(a)             => topLevel(schema, a)
    case _                        => false
  }

  private def topLevel(schema: StructType, a: String): Boolean =
    !a.contains(".") && schema.fieldNames.contains(a)

  private def simple(schema: StructType, a: String, v: Any): Boolean =
    topLevel(schema, a) && (v match {
      case _: String | _: java.lang.Boolean | _: java.lang.Number => true
      case _ => false
    })

  def eval(f: Filter, data: JsonNode): Boolean = f match {
    case IsNotNull(a) =>
      val n = data.get(a); n != null && !n.isNull
    case EqualTo(a, v)            => cmp(data, a, v).contains(0)
    case GreaterThan(a, v)        => cmp(data, a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(data, a, v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(data, a, v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(data, a, v).exists(_ <= 0)
    case _                        => true // unsupported filters never reach partitions
  }

  /** None = incomparable (missing/null/type-mismatched field) — which
    * fails every comparison, mirroring SQL null semantics.
    */
  private def cmp(data: JsonNode, a: String, v: Any): Option[Int] = {
    val n = data.get(a)
    if (n == null || n.isNull) None
    else v match {
      case s: String =>
        if (n.isTextual) Some(n.asText.compareTo(s)) else None
      case b: java.lang.Boolean =>
        if (n.isBoolean) Some(java.lang.Boolean.compare(n.asBoolean, b)) else None
      case num: java.lang.Number =>
        if (n.isNumber)
          Some(new java.math.BigDecimal(n.asText)
            .compareTo(new java.math.BigDecimal(num.toString)))
        else None
      case _ => None
    }
  }
}

final case class ConnectorInputPartition(
    index: Int,
    command: Seq[String],
    stream: String,
    filters: Seq[Filter] = Seq.empty)
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
          if ((partition.stream.isEmpty || rec.path("stream").asText == partition.stream) &&
              partition.filters.forall(ConnectorFilterEval.eval(_, rec.get("data"))))
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
