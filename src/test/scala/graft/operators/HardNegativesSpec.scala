package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {

  test("hardNegatives drops positives and re-ranks the remainder in ranking order") {
    val ranked = spark.createDataFrame(
      Seq((10L, 1), (20L, 2), (30L, 3), (40L, 4), (50L, 5)))
      .toDF("doc_id", "rank")
    val positives = spark.createDataFrame(Seq(Tuple1(20L), Tuple1(40L), Tuple1(99L)))
      .toDF("doc_id")
    val neg = Retrieval.hardNegatives(ranked, "doc_id", positives, "doc_id", nNeg = 2)
      .orderBy("neg_rank").collect()
    assert(neg.map(_.getLong(0)).toSeq === Seq(10L, 30L))
    assert(neg.map(_.getInt(neg.head.fieldIndex("neg_rank"))).toSeq === Seq(1, 2))
  }

  test("an all-positive ranking yields no negatives") {
    val ranked = spark.createDataFrame(Seq((1L, 1), (2L, 2))).toDF("doc_id", "rank")
    val positives = ranked.select("doc_id")
    assert(Retrieval.hardNegatives(ranked, "doc_id", positives, "doc_id", 5).count() === 0L)
  }
}
