package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: latest right row at-or-before each left row per key") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 10L), (4L, "A", 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 10L, 100.0), ("A", 20L, 101.0), ("B", 50L, 200.0))
      .toDF("sym", "t", "px")
    val out = Joins.asofBackward(trades, quotes, Seq("sym"), "t", Seq("px"))
      .orderBy("trade_id").collect()
    // trade 1: A@10 -> quote A@10 (inclusive tie). trade 2: A@25 -> A@20.
    // trade 3: B@10 -> no quote yet -> null. trade 4: A@5 -> null.
    assert(out.map(r => Option(r.getAs[Any]("px"))).toSeq ==
      Seq(Some(100.0), Some(101.0), None, None))
  }

  test("range join bucketed equals naive range join") {
    val points = (1L to 200L).map(i => (i, i * 7L % 500L)).toDF("pid", "x")
    val intervals = Seq((1L, 0L, 50L), (2L, 40L, 120L), (3L, 300L, 499L), (4L, 600L, 700L))
      .toDF("iid", "s", "e")
    val naive = points.join(intervals, col("x") >= col("s") && col("x") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Joins.rangeJoinBucketed(points, intervals, "x", "s", "e", bucketWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }
}
