package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    "the quick brown fox jumps over the lazy dog",
    "to be or not to be that is the question").toDF("text")

  test("overlap: verbatim copy ~1.0, partial overlap in between, clean ~0.0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim benchmark doc
      (2L, "the quick brown fox went somewhere else entirely today"), // shares a prefix
      (3L, "completely unrelated text about spark physical plans")) // clean
      .toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, "doc_id", "text", bench, "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) > 0.0 && out(2L) < 1.0)
    assert(out(3L) == 0.0)
  }

  test("decontaminate drops only documents at/above the threshold") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox went somewhere else entirely today"),
      (3L, "completely unrelated text about spark physical plans"))
      .toDF("doc_id", "text")
    val kept = Contamination.decontaminate(corpus, "doc_id", "text", bench, "text",
      threshold = 0.5, shingleN = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("benchmark side broadcasts; corpus side has no pre-aggregation shuffle of text") {
    val docs = graft.Tables.documents(spark, sf)
    val df = Contamination.overlap(docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 25),
      "doc_id", "text", docs.filter(org.apache.spark.sql.functions.col("doc_id") < 25), "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one shingling pass: corpus joins the broadcast bench-hash set LEFT
    // (match flags), no second scan/subtree of the corpus
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"), plan)
    assert("Scan parquet".r.findAllIn(plan).size <= 4, plan) // corpus+bench (AQE prints twice)
  }

  test("docs with no shingles report 0/0 contamination, not a crash") {
    val corpus = Seq((1L, ""), (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, "doc_id", "text", bench, "text", shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == 0.0)
    assert(byId(2L)._4 == 1.0)
  }
}
