package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON Schema ⇄ Catalyst `StructType` translation.
  *
  * The reference engine's entire type system is JSON Schema as emitted by
  * Airbyte connector discovery (reference `tap_airbyte/tap.py:909-913`):
  * nullable-by-union (`["null","integer"]`), arbitrarily nested objects and
  * arrays, occasionally free-form objects with no declared properties.
  *
  * Mapping policy (SURVEY.md §1.4):
  *   - `integer` → LongType, `number` → DoubleType, `string` → StringType,
  *     `boolean` → BooleanType, `null`-only → StringType
  *   - `["T","null"]` union → T with `nullable = true` (everything is
  *     nullable here, matching the reference which never enforces NOT NULL)
  *   - multi-type non-null unions (e.g. `["string","integer"]`) → StringType
  *     raw-JSON fallback (lossless, order-preserving)
  *   - `object` with `properties` → StructType, field order preserved
  *   - `object` without `properties` → StringType holding the raw JSON text
  *     (free-form objects, e.g. reference `tap.py:130`)
  *   - `array` with `items` → ArrayType(convert(items)); without → ArrayType(StringType)
  *   - missing/unknown `type` → StringType
  */
object JsonSchemaConverter {

  private val mapper = new ObjectMapper()

  /** Parse a JSON Schema document (for one stream) into a StructType. */
  def toStructType(jsonSchema: String): StructType =
    toStructType(mapper.readTree(jsonSchema))

  def toStructType(schema: JsonNode): StructType =
    toDataType(schema) match {
      case st: StructType => st
      case other          => StructType(Seq(StructField("value", other, nullable = true)))
    }

  /** Core recursive JSON-Schema-node → DataType conversion. */
  def toDataType(node: JsonNode): DataType = {
    val types = declaredTypes(node)
    val nonNull = types.filterNot(_ == "null")
    nonNull match {
      case Seq("integer") => LongType
      case Seq("number")  => DoubleType
      case Seq("boolean") => BooleanType
      case Seq("string")  => StringType
      case Seq("object") =>
        val props = node.get("properties")
        if (props == null || !props.fieldNames().hasNext) StringType // free-form object → raw JSON
        else {
          val fields = props.properties().asScala.toSeq.map { e =>
            StructField(e.getKey, toDataType(e.getValue), nullable = true)
          }
          StructType(fields)
        }
      case Seq("array") =>
        val items = node.get("items")
        if (items == null) ArrayType(StringType, containsNull = true)
        else ArrayType(toDataType(items), containsNull = true)
      case Seq() => StringType // no type declared, or null-only
      case _     => StringType // multi-type union → raw JSON fallback
    }
  }

  /** The `type` keyword as a list: "integer" and ["null","integer"] both work. */
  private def declaredTypes(node: JsonNode): Seq[String] = {
    val t = node.get("type")
    if (t == null) Seq.empty
    else if (t.isTextual) Seq(t.asText)
    else if (t.isArray) t.elements().asScala.map(_.asText).toSeq
    else Seq.empty
  }

  // ---------------------------------------------------------------------
  // Reverse direction: StructType → JSON Schema (for Singer SCHEMA messages)
  // ---------------------------------------------------------------------

  /** Serialize a StructType back to a Singer-style JSON Schema document with
    * nullable unions, mirroring what Airbyte discovery would have produced.
    */
  def toJsonSchema(st: StructType): String =
    mapper.writeValueAsString(structNode(st))

  def toJsonSchemaNode(st: StructType): JsonNode = structNode(st)

  private def structNode(st: StructType): ObjectNode = {
    val obj = mapper.createObjectNode()
    obj.put("type", "object")
    val props = obj.putObject("properties")
    st.fields.foreach(f => props.set[JsonNode](f.name, typeNode(f.dataType)))
    obj
  }

  private def typeNode(dt: DataType): ObjectNode = dt match {
    case st: StructType =>
      val n = structNode(st)
      nullableUnion(n, "object"); n
    case ArrayType(et, _) =>
      val n = mapper.createObjectNode()
      nullableUnion(n, "array")
      n.set[JsonNode]("items", typeNode(et)); n
    case other =>
      val n = mapper.createObjectNode()
      val t = other match {
        case LongType | IntegerType | ShortType | ByteType => "integer"
        case DoubleType | FloatType | _: DecimalType       => "number"
        case BooleanType                                   => "boolean"
        case DateType | TimestampType | TimestampNTZType =>
          n.put("format", "date-time"); "string"
        case _ => "string"
      }
      nullableUnion(n, t); n
  }

  private def nullableUnion(n: ObjectNode, t: String): Unit = {
    val arr: ArrayNode = n.putArray("type")
    arr.add("null"); arr.add(t)
    ()
  }
}
