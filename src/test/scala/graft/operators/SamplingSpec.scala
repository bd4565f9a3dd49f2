package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedHead keeps exactly min(n, |stratum|) lowest-order rows per stratum") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 9L),
      ("b", 5L), ("b", 4L),
      ("c", 7L)).toDF("g", "id")
    val out = Sampling.stratifiedHead(df, Seq("g"), "id", n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 4L), ("b", 5L), ("c", 7L)))
  }

  test("stratifiedHead plans WindowGroupLimit (per-partition pruning before the shuffle)") {
    val docs = Tables.documents(spark, sf)
    val df = Sampling.stratifiedHead(docs, Seq("lang"), "doc_id", n = 10)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("hashSplit is deterministic across repartitionings and respects weights roughly") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.hashSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2) // same key -> same split, independent of partitioning
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = s1.size.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("val", 0) > 0 && counts.getOrElse("test", 0) > 0)
    // a different seed reshuffles the assignment
    val s3 = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s3 != s1)
  }
}
