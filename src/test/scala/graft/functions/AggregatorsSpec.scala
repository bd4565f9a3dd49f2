package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  private def grouped(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(Aggregators.TopKLong.topk(col("v"), 3).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("topk keeps the k largest, sorted descending, under any partitioning") {
    val rows = Seq(("a", 5L), ("a", 9L), ("a", 1L), ("a", 7L), ("a", 3L),
      ("b", 2L), ("b", 2L))
    val df = rows.toDF("g", "v")
    val expect = Map("a" -> Seq(9L, 7L, 5L), "b" -> Seq(2L, 2L))
    assert(grouped(df) == expect)
    assert(grouped(df.repartition(7)) == expect) // merge path exercised
  }

  test("topk: duplicates at the boundary keep the exact multiset") {
    val df = Seq(("a", 9L), ("a", 9L), ("a", 9L), ("a", 9L), ("a", 1L))
      .toDF("g", "v")
    assert(grouped(df) == Map("a" -> Seq(9L, 9L, 9L)))
  }

  test("topk ignores nulls and negative values are ordinary values") {
    val df = Seq(("a", java.lang.Long.valueOf(-5L)),
      ("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(-1L))).toDF("g", "v")
    assert(grouped(df) == Map("a" -> Seq(-1L, -5L)))
  }

  test("topk partially aggregates map-side (no full-row shuffle)") {
    val df = spark.range(0, 10000).select(
      (col("id") % 7).cast("string").as("g"), col("id").as("v"))
    val q = df.groupBy(col("g"))
      .agg(Aggregators.TopKLong.topk(col("v"), 3).as("top"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // two-phase aggregation: a partial ObjectHashAggregate below the
    // exchange trims each partition to <= k values per group
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }
}
