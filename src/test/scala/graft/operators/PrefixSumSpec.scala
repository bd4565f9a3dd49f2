package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves [[PrefixSum.runningTotals]] (range-bucketed local cumsums +
  * offset recovery — the 100 TB shape) equals the single-partition
  * global-window cumsum ROW FOR ROW, across bucket counts including
  * degenerate splits (1 bucket = the reference itself; more buckets than
  * rows = empty/singleton buckets).
  */
class PrefixSumSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // deliberately non-contiguous, unordered keys with negative values
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0 until 500).toList)
      .map(i => (i.toLong * 3 + 11, rnd.nextInt(100).toLong - 20,
        rnd.nextInt(10).toLong))
      .toDF("k", "x", "y")
  }

  private def reference = {
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fixture.select(col("k"),
        sum(col("x")).over(w).as("cum_x"), sum(col("y")).over(w).as("cum_y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("bucketed running totals == global-window cumsum across bucket counts") {
    val ref = reference
    for (nRanges <- Seq(1, 2, 8, 64, 1000)) {
      val got = PrefixSum.runningTotals(fixture, "k", Seq("x", "y"), nRanges)
        .select(col("k"), col("cum_x"), col("cum_y"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == ref, s"mismatch at numRanges=$nRanges")
    }
  }

  test("passthrough columns survive and totals close over the whole table") {
    val out = PrefixSum.runningTotals(fixture, "k", Seq("x"), 8)
    assert(out.columns.toSet == Set("k", "x", "y", "cum_x"))
    val last = out.orderBy(col("k").desc).limit(1).collect()(0)
    val total = fixture.agg(sum(col("x"))).collect()(0).getLong(0)
    assert(last.getAs[Long]("cum_x") == total)
  }
}
