package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch keeps the k smallest distinct values, sorted ascending") {
    val df = Seq(50L, 10L, 30L, 10L, 20L, 40L, 30L).toDF("h")
    val out = df.agg(KmvSketchAgg.kmv_sketch(col("h"), 3).as("mh"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(10L, 20L, 30L))
  }

  test("under k distinct values the sketch IS the distinct set (exact mode)") {
    val df = Seq(7L, 7L, 3L, 3L, 3L).toDF("h")
    val out = df.agg(KmvSketchAgg.kmv_sketch(col("h"), 64).as("mh"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(3L, 7L))
  }

  test("partition-order independence: any repartitioning merges to the same sketch") {
    val base = (1L to 1000L).map(i => i * 2654435761L % 100000L).toDF("h")
    val a = base.repartition(1).agg(KmvSketchAgg.kmv_sketch(col("h"), 16)).collect().head.getSeq[Long](0)
    val b = base.repartition(13).agg(KmvSketchAgg.kmv_sketch(col("h"), 16)).collect().head.getSeq[Long](0)
    val c = base.orderBy(col("h").desc).coalesce(2).agg(KmvSketchAgg.kmv_sketch(col("h"), 16)).collect().head.getSeq[Long](0)
    assert(a == b && b == c, "KMV state must be a pure set property")
  }

  test("nulls are skipped, not sketched") {
    val df = Seq(Some(5L), None, Some(1L), None).toDF("h")
    val out = df.agg(KmvSketchAgg.kmv_sketch(col("h"), 4).as("mh"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(1L, 5L))
  }
}
