package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact top-k when capacity exceeds distinct count (partial+merge across partitions)") {
    val docs = (1 to 400).map { i =>
      val words = Seq.fill(i % 5 + 1)("common") ++
        (if (i % 2 == 0) Seq("even", "even") else Seq("odd")) ++
        Seq(s"rare$i")
      (i % 3, words)
    }.toDF("g", "tokens").repartition(7) // force multi-partition partial aggs
    val hh = docs.groupBy("g")
      .agg(HeavyHittersAgg.heavy_hitters(col("tokens"), 3).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select(col("g"), col("h.token"), col("h.cnt"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    val exact = docs.select(col("g"), explode(col("tokens")).as("token"))
      .groupBy("g", "token").count()
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("count").desc, col("token"))))
      .filter(col("rn") <= 3)
      .select(col("g"), col("token"), col("count"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    assert(hh.toSet == exact.toSet)
    assert(hh.nonEmpty)
  }

  test("bounded capacity: still returns k candidates under eviction pressure") {
    val df = (1 to 2000).map(i =>
      (1, Seq(if (i % 3 == 0) "hot" else s"cold$i"))).toDF("g", "tokens")
    val out = df.groupBy("g")
      .agg(HeavyHittersAgg.heavy_hitters(col("tokens"), 1, capacity = 8).as("hh"))
      .select(explode(col("hh")).as("h")).select("h.token").collect()
    // Misra-Gries guarantee: any token with freq > n/capacity survives — "hot" (1/3 of stream) must
    assert(out.map(_.getString(0)).contains("hot"))
  }
}
