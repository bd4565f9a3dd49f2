package graft.schema

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property test for the JSON-Schema bridge (SURVEY §7 calls it the
  * hardest parity item): for every StructType built from the types the
  * converter can represent, `toStructType(toJsonSchema(st))` must be the
  * IDENTITY up to the engine's documented widenings (ints → LongType,
  * floats/decimals → DoubleType, temporals → StringType ISO — the same
  * scalar policy as the reference serializer, tap.py:48-59).
  */
object SchemaRoundTripProps extends Properties("JsonSchemaConverter.roundTrip") {

  private val genLeaf: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, ShortType, ByteType,
    DoubleType, FloatType, DecimalType(18, 2),
    BooleanType, StringType, DateType, TimestampType)

  private def genType(depth: Int): Gen[DataType] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      6 -> genLeaf,
      2 -> Gen.lzy(genStruct(depth - 1)),
      2 -> Gen.lzy(genType(depth - 1).map(ArrayType(_, containsNull = true))))

  private def genStruct(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
      types <- Gen.sequence[Seq[DataType], DataType](names.map(_ => genType(depth)))
    } yield StructType(names.zip(types).map { case (nm, t) =>
      StructField(nm, t, nullable = true)
    }.toSeq)

  /** The engine's documented scalar widening (JSON has two number shapes). */
  private def widen(dt: DataType): DataType = dt match {
    case LongType | IntegerType | ShortType | ByteType   => LongType
    case DoubleType | FloatType | _: DecimalType          => DoubleType
    case DateType | TimestampType | TimestampNTZType      => StringType
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = widen(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(widen(et), containsNull = true)
    case other            => other
  }

  property("toStructType(toJsonSchema(st)) == widened(st)") =
    Prop.forAll(genStruct(3)) { st =>
      val back = JsonSchemaConverter.toStructType(JsonSchemaConverter.toJsonSchema(st))
      (back == widen(st)) :| s"got:\n$back\nexpected:\n${widen(st)}"
    }
}
