package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamMapsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alice", 10.0, "x"),
    (2L, "bob", 60.0, "y"),
    (3L, "carol", 90.0, "z")).toDF("id", "name", "score", "tag")

  test("filter + computed + rename + drop compose in order") {
    val out = StreamMaps(df, StreamMaps.StreamMap(
      filter = Some("score > 50"),
      computed = Seq("score2" -> "score * 2", "upper_name" -> "upper(name)"),
      renames = Map("id" -> "row_id"),
      drops = Seq("tag")))
    assert(out.columns.toSeq == Seq("row_id", "name", "score", "score2", "upper_name"))
    val rows = out.orderBy("row_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(rows.head.getAs[Double]("score2") == 120.0)
    assert(rows.head.getAs[String]("upper_name") == "BOB")
  }

  test("keepOnly projects to exactly the requested columns") {
    val out = StreamMaps(df, StreamMaps.StreamMap(keepOnly = Seq("name", "score")))
    assert(out.columns.toSeq == Seq("name", "score"))
  }

  test("alias renames the output stream; source duplicates another stream") {
    val src = new graft.sources.FileNativeSource(Seq(
      graft.sources.FileNativeSource.FileStream("nation", "parquet", s"$sf/nation.parquet")))
    val engine = new SyncEngine(src, Map(
      "nation" -> StreamMaps.StreamMap(alias = Some("nations_renamed")),
      "nation_big" -> StreamMaps.StreamMap(
        source = Some("nation"), filter = Some("n_nationkey >= 10"))))
    val out = engine.sync(spark, _ => true)
    assert(out.keySet == Set("nations_renamed", "nation_big"))
    assert(out("nations_renamed").count() == 25)
    assert(out("nation_big").count() == 15)
  }

  test("flatten expands nested structs with __ names; arrays become JSON strings") {
    val nested = df.select(
      col("id"),
      struct(col("name").as("n"), struct(col("score").as("s")).as("inner")).as("info"),
      array(lit(1), lit(2)).as("nums"))
    val flat = StreamMaps.flatten(nested)
    assert(flat.columns.toSeq == Seq("id", "info__n", "info__inner__s", "nums"))
    assert(flat.schema("nums").dataType == StringType) // array JSON-serialized
    val r = flat.orderBy("id").head()
    assert(r.getAs[String]("nums") == "[1,2]")
    assert(r.getAs[Double]("info__inner__s") == 10.0)
  }

  test("flatten respects maxDepth: structs at the limit JSON-serialize") {
    val nested = df.select(col("id"),
      struct(col("name").as("n"), struct(col("score").as("s")).as("inner")).as("info"))
    val flat = StreamMaps.flatten(nested, maxDepth = 1)
    assert(flat.columns.toSeq == Seq("id", "info__n", "info__inner"))
    assert(flat.schema("info__inner").dataType == StringType)
  }
}
