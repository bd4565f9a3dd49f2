package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonSchemaConverterSpec extends AnyFunSuite {

  test("flat nullable-union schema (KPHX shape)") {
    val schema =
      """{"type":"object","properties":{
           "date":{"type":["string","null"]},
           "actual_mean_temp":{"type":["number","null"]},
           "record_min_temp_year":{"type":["number","null"]}}}"""
    val st = JsonSchemaConverter.toStructType(schema)
    assert(st.fieldNames.toSeq == Seq("date", "actual_mean_temp", "record_min_temp_year"))
    assert(st("date").dataType == StringType)
    assert(st("actual_mean_temp").dataType == DoubleType)
    assert(st.fields.forall(_.nullable))
  }

  test("deep nesting: objects, arrays of objects, arrays-of-objects-of-arrays (SMEARGLE shape)") {
    val schema =
      """{"type":"object","properties":{
           "id":{"type":["null","integer"]},
           "name":{"type":["null","string"]},
           "is_default ":{"type":["null","boolean"]},
           "sprites":{"type":["null","object"],"properties":{
             "front_default":{"type":["null","string"]}}},
           "abilities":{"type":["null","array"],"items":{"type":["null","object"],"properties":{
             "is_hidden":{"type":["null","boolean"]},
             "ability":{"type":["null","object"],"properties":{
               "name":{"type":["null","string"]}}}}}},
           "moves":{"type":["null","array"],"items":{"type":["null","object"],"properties":{
             "version_group_details":{"type":["null","array"],"items":{"type":["null","object"],"properties":{
               "level_learned_at":{"type":["null","integer"]}}}}}}}}}"""
    val st = JsonSchemaConverter.toStructType(schema)
    assert(st("id").dataType == LongType)
    assert(st("is_default ").dataType == BooleanType) // trailing space preserved verbatim
    assert(st("sprites").dataType.isInstanceOf[StructType])
    val abilities = st("abilities").dataType.asInstanceOf[ArrayType]
    val ability = abilities.elementType.asInstanceOf[StructType]("ability").dataType
    assert(ability.isInstanceOf[StructType])
    val moves = st("moves").dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val vgd = moves("version_group_details").dataType.asInstanceOf[ArrayType]
    assert(vgd.elementType.asInstanceOf[StructType]("level_learned_at").dataType == LongType)
  }

  test("free-form object falls back to raw-JSON string; multi-type union too") {
    val st = JsonSchemaConverter.toStructType(
      """{"type":"object","properties":{
           "free":{"type":"object"},
           "poly":{"type":["string","integer"]},
           "untyped":{},
           "arr_untyped":{"type":"array"}}}""")
    assert(st("free").dataType == StringType)
    assert(st("poly").dataType == StringType)
    assert(st("untyped").dataType == StringType)
    assert(st("arr_untyped").dataType == ArrayType(StringType, containsNull = true))
  }

  test("StructType -> JSON Schema -> StructType roundtrip") {
    val st = StructType(Seq(
      StructField("a", LongType),
      StructField("b", DoubleType),
      StructField("c", StringType),
      StructField("d", BooleanType),
      StructField("nested", StructType(Seq(StructField("x", StringType)))),
      StructField("items", ArrayType(StructType(Seq(StructField("y", LongType)))))))
    val back = JsonSchemaConverter.toStructType(JsonSchemaConverter.toJsonSchema(st))
    def norm(t: StructType): Seq[(String, DataType)] = t.fields.toSeq.map(f => (f.name, f.dataType))
    assert(norm(back) == norm(StructType(st.map(f => f.copy(nullable = true)))))
  }

  test("temporal types serialize as string with date-time format") {
    val js = JsonSchemaConverter.toJsonSchema(StructType(Seq(StructField("ts", TimestampType))))
    assert(js.contains("date-time"))
    assert(js.contains("string"))
  }
}
