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

  test("upsert keeps the latest version per primary key with deterministic tiebreak") {
    val log = Seq(
      (1L, "k1", 10L, "v1"), (2L, "k1", 20L, "v2"), // k1: id 2 is latest
      (3L, "k2", 5L, "a"),                          // k2: single version
      (4L, "k3", 7L, "x"), (5L, "k3", 7L, "y"))     // k3: cursor tie -> max id wins
      .toDF("id", "key", "cur", "val")
    val out = Upsert.latestByKey(log, Seq("key"), "cur", tiebreak = Seq("id"))
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(1), r.getLong(0), r.getString(3))).toSeq ==
      Seq(("k1", 2L, "v2"), ("k2", 3L, "a"), ("k3", 5L, "y")))
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
