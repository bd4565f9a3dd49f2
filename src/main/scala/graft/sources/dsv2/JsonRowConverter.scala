package graft.sources.dsv2

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, DateTimeUtils, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.ZoneOffset
import scala.jdk.CollectionConverters._

/** Recursive JsonNode → InternalRow conversion for the DSv2 connector
  * reader. Every type [[graft.schema.JsonSchemaConverter]] can produce
  * (scalars, StructType, ArrayType) converts to its proper Catalyst
  * physical representation; user-declared schemas additionally get
  * temporal, decimal, binary and string-keyed map support. Anything else
  * is rejected loudly at PLAN time ([[validateSupported]]) rather than
  * producing corrupt rows at scan time.
  */
object JsonRowConverter {

  /** Throw at planning if the schema contains a field this reader cannot
    * faithfully materialize.
    */
  def validateSupported(schema: StructType): Unit = {
    def check(dt: DataType, path: String): Unit = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
          BooleanType | StringType | BinaryType | DateType | TimestampType |
          TimestampNTZType | _: DecimalType => ()
      case st: StructType => st.fields.foreach(f => check(f.dataType, s"$path.${f.name}"))
      case ArrayType(et, _) => check(et, s"$path[]")
      case MapType(StringType, vt, _) => check(vt, s"$path{}")
      case other => throw new IllegalArgumentException(
        s"graft-airbyte: unsupported field type ${other.simpleString} at '$path'; " +
          "declare the field as STRING to receive its raw JSON text")
    }
    schema.fields.foreach(f => check(f.dataType, f.name))
  }

  def toInternalRow(data: JsonNode, schema: StructType): InternalRow = {
    val values = new Array[Any](schema.fields.length)
    var i = 0
    while (i < values.length) {
      val f = schema.fields(i)
      values(i) = convertValue(if (data == null) null else data.get(f.name), f.dataType)
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** Numeric JSON timestamp → micros, millis-only convention (see the
    * TimestampType case). Rejects fractional values and millis that would
    * overflow the micros representation.
    */
  private def epochMillisToMicros(v: JsonNode): java.lang.Long = {
    // canConvertToExactIntegral, not isIntegralNumber: Python-style
    // serializers emit integral epoch millis as floats (1699999999999.0),
    // which satisfy the convention; genuinely fractional values don't.
    // canConvertToLong additionally rejects BigInteger tokens that asLong
    // would silently wrap into garbage before the overflow check.
    if (!v.canConvertToExactIntegral || !v.canConvertToLong)
      throw new IllegalArgumentException(
        s"graft-airbyte: numeric timestamp must be integral epoch milliseconds, got ${v.asText}")
    val millis = v.asLong
    if (millis > Long.MaxValue / 1000L || millis < Long.MinValue / 1000L)
      throw new IllegalArgumentException(
        s"graft-airbyte: epoch-millis timestamp $millis overflows the micros range " +
          "(is the source emitting micros or nanos?)")
    millis * 1000L
  }

  /** Single-field conversion for the source-side filter eval
    * ([[ConnectorFilterEval]]) — the same code path row materialization
    * uses, so eval-vs-residual coercion can never diverge.
    */
  def convertScalar(v: JsonNode, dt: DataType): Any = convertValue(v, dt)

  private def convertValue(v: JsonNode, dt: DataType): Any = {
    if (v == null || v.isNull) return null
    dt match {
      case LongType    => v.asLong
      case IntegerType => v.asInt
      case ShortType   => v.asInt.toShort
      case ByteType    => v.asInt.toByte
      case DoubleType  => v.asDouble
      case FloatType   => v.asDouble.toFloat
      case BooleanType => v.asBoolean
      case StringType  => UTF8String.fromString(if (v.isTextual) v.asText else v.toString)
      case BinaryType  => v.binaryValue() // base64 text per JSON convention
      case d: DecimalType =>
        Decimal(scala.math.BigDecimal(new java.math.BigDecimal(v.asText)), d.precision, d.scale)
      case DateType =>
        DateTimeUtils.stringToDate(UTF8String.fromString(v.asText))
          .map(Integer.valueOf).orNull
      case TimestampType =>
        // ISO-8601 text (the Airbyte convention); numbers are epoch
        // MILLISECONDS only — a deliberate convention, enforced: sources
        // also exist that emit epoch seconds or micros, and guessing the
        // unit by magnitude would silently mis-scale by 1000x, so anything
        // non-integral (or outside the micros-representable range when
        // scaled) is rejected loudly instead of truncated.
        if (v.isNumber) epochMillisToMicros(v)
        else DateTimeUtils.stringToTimestamp(
          UTF8String.fromString(v.asText), ZoneOffset.UTC)
          .map(java.lang.Long.valueOf).orNull
      case TimestampNTZType =>
        if (v.isNumber) epochMillisToMicros(v)
        else DateTimeUtils.stringToTimestampWithoutTimeZone(
          UTF8String.fromString(v.asText))
          .map(java.lang.Long.valueOf).orNull
      case st: StructType =>
        if (!v.isObject) null else toInternalRow(v, st)
      case ArrayType(et, _) =>
        if (!v.isArray) null
        else new GenericArrayData(v.elements().asScala.map(convertValue(_, et)).toArray)
      case MapType(StringType, vt, _) =>
        if (!v.isObject) null
        else {
          val entries = v.properties().asScala.toSeq
          ArrayBasedMapData(
            entries.map(e => UTF8String.fromString(e.getKey)).toArray[Any],
            entries.map(e => convertValue(e.getValue, vt)).toArray[Any])
        }
      case other =>
        throw new IllegalArgumentException(s"graft-airbyte: unsupported type ${other.simpleString}")
    }
  }
}
