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

  test("bucketed running max == global-window max, inclusive and exclusive") {
    for (excl <- Seq(false, true)) {
      val frameEnd = if (excl) -1L else 0L
      val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, frameEnd)
      val ref = fixture.select(col("k"), max(col("x")).over(w).as("m"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      for (nRanges <- Seq(1, 3, 16, 1000)) {
        val got = PrefixSum.runningMax(fixture, "k", "x", nRanges, exclusive = excl)
          .select(col("k"), col("runmax_x"))
          .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
        assert(got == ref, s"runningMax mismatch exclusive=$excl numRanges=$nRanges")
      }
    }
  }

  test("running max over DOUBLE order keys (skyline shape) matches reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0 until 300).map(_ => (rnd.nextDouble() * 40 - 20, rnd.nextInt(1000).toLong))
      .distinct.toDF("price", "quality")
    val w = Window.orderBy(col("price")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.select(col("price"), max(col("quality")).over(w).as("m"))
      .collect().map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val got = PrefixSum.runningMax(df, "price", "quality", 16, exclusive = true)
      .select(col("price"), col("runmax_quality"))
      .collect().map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got == ref)
  }

  test("multi-column mixed-direction running totals == global window") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // deliberately heavy ties on the leading key so the tiebreak column
    // carries the total order, plus negatives for the desc negation
    val df = (0 until 400).map(i => (rnd.nextInt(12).toLong - 6, i.toLong,
      rnd.nextInt(100).toLong)).toDF("a", "id", "x")
    val w = Window.orderBy(col("a").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select(col("id"), sum(col("x")).over(w).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nRanges <- Seq(1, 4, 32, 500)) {
      val got = PrefixSum.runningTotalsOrdered(df,
          Seq(("a", false), ("id", true)), Seq("x"), nRanges)
        .select(col("id"), col("cum_x"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"ordered cumsum mismatch at numRanges=$nRanges")
    }
  }

  test("ordered variant reproduces Spark's ntile buckets via the rank formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (0 until 237).map(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("id", "v")
    val ref = df.select(col("id"),
        ntile(5).over(Window.orderBy(col("v").desc, col("id").asc)).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = df.count()
    val got = PrefixSum.runningTotalsOrdered(
        df.withColumn("__one", lit(1L)).withColumn("__n", lit(n)),
        Seq(("v", false), ("id", true)), Seq("__one"), 16)
      .withColumn("b", expr(
        """CASE WHEN cum___one <= (__n % 5) * (__n div 5 + 1)
             THEN (cum___one - 1) div (__n div 5 + 1) + 1
             ELSE (__n % 5) + (cum___one - (__n % 5) * (__n div 5 + 1) - 1)
                    div (__n div 5) + 1 END"""))
      .select(col("id"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
  }

  test("passthrough columns survive and totals close over the whole table") {
    val out = PrefixSum.runningTotals(fixture, "k", Seq("x"), 8)
    assert(out.columns.toSet == Set("k", "x", "y", "cum_x"))
    val last = out.orderBy(col("k").desc).limit(1).collect()(0)
    val total = fixture.agg(sum(col("x"))).collect()(0).getLong(0)
    assert(last.getAs[Long]("cum_x") == total)
  }
}
