package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatviewSpec extends SparkSpec {

  private lazy val rows = spark.createDataFrame(
    (1 to 100).map(i => (i % 7L, i, i * 0.25))).toDF("k", "id", "v")

  private def viewOf(splits: Seq[Int]): Array[(Long, Long, Double, Double)] = {
    // fold deltas split at the given id boundaries
    val bounds = (0 +: splits) :+ 101
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      rows.filter(col("id") >= lo && col("id") < hi)
    }.toSeq
    val state = batches.tail.foldLeft(
      Matview.partial(batches.head, Seq("k"), "v")) { (st, delta) =>
      Matview.refresh(st, delta, Seq("k"), "v")
    }
    Matview.read(state, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
  }

  test("incremental refreshes equal the one-shot aggregate for any batch split") {
    val full = viewOf(Seq.empty)
    assert(viewOf(Seq(50)) === full)
    assert(viewOf(Seq(20, 40, 60, 80)) === full)
    assert(viewOf(Seq(1, 2, 3)) === full) // tiny + huge deltas
  }

  test("the state is additive: n and total match direct computation") {
    val full = viewOf(Seq(33, 66)).map(t => t._1 -> ((t._2, t._3))).toMap
    val direct = rows.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(full === direct)
  }
}
