package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves [[PrefixSum.runningTotalsGrouped]] (per-group range-bucketed
  * cumsums — the few-heavy-groups 100 TB shape) equals the
  * `partitionBy(g).orderBy(k)` window ROW FOR ROW across bucket counts,
  * including degenerate splits, skewed groups, null group keys, and NaN
  * order keys (the r11 ADVICE finding: NaN must land where the window's
  * NaN-sorts-last rule puts it, not in the cast-0 mid-range bucket).
  */
class GroupedPrefixSumSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // 3 groups with very different sizes (the weighted-quantile shape:
    // few heavy groups), unique order key per group, negative values
    val rows = for {
      (g, n) <- Seq(("A", 400), ("B", 60), ("C", 7))
      i <- 0 until n
    } yield (g, i.toLong * 5 + rnd.nextInt(4), rnd.nextInt(100).toLong - 30)
    // de-dup keys within group (rnd can collide): keep first
    rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("g", "k", "x")
  }

  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("g"), col("k"), sum(col("x")).over(w).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("grouped running totals == per-group window across bucket counts") {
    val df = fixture
    val ref = reference(df)
    for (nRanges <- Seq(1, 2, 8, 64, 1000)) {
      val got = PrefixSum.runningTotalsGrouped(df, Seq("g"), "k", Seq("x"), nRanges)
        .select(col("g"), col("k"), col("cum_x"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == ref, s"grouped cumsum mismatch at numRanges=$nRanges")
    }
  }

  test("null group keys form their own partition (null-safe offsets join)") {
    import spark.implicits._
    val df = Seq((Some("A"), 1L, 10L), (Some("A"), 2L, 5L),
        (None, 1L, 7L), (None, 3L, 2L), (None, 9L, 1L))
      .toDF("g", "k", "x")
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select(col("g"), col("k"), sum(col("x")).over(w).as("c"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val got = PrefixSum.runningTotalsGrouped(df, Seq("g"), "k", Seq("x"), 4)
      .select(col("g"), col("k"), col("cum_x"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    assert(got.size == 5, "null-group rows must not drop in the offsets join")
  }

  test("NaN order keys match the window's NaN-sorts-last semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 80).map(i => ("G", i * 1.5 - 40, rnd.nextInt(20).toLong)) ++
      Seq(("G", Double.NaN, 100L))
    val df = rows.toDF("g", "k", "x")
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val key = (r: org.apache.spark.sql.Row) =>
      (java.lang.Double.doubleToLongBits(r.getDouble(0)), r.getLong(1))
    val ref = df.select(col("k"), sum(col("x")).over(w).as("c")).collect().map(key).toSet
    for (nRanges <- Seq(1, 4, 16)) {
      val got = PrefixSum.runningTotalsGrouped(df, Seq("g"), "k", Seq("x"), nRanges)
        .select(col("k"), col("cum_x")).collect().map(key).toSet
      assert(got == ref, s"NaN grouped cumsum mismatch at numRanges=$nRanges")
    }
    // the global (ungrouped) form shares the same NaN override
    val wg = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refG = df.select(col("k"), sum(col("x")).over(wg).as("c")).collect().map(key).toSet
    val gotG = PrefixSum.runningTotals(df.drop("g"), "k", Seq("x"), 8)
      .select(col("k"), col("cum_x")).collect().map(key).toSet
    assert(gotG == refG, "NaN global cumsum mismatch")
  }

  test("NaN keys in the ordered (mixed-direction) variant, asc and desc") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (0 until 60).map(i => (i * 2.0 - 30, i.toLong, rnd.nextInt(9).toLong)) ++
      Seq((Double.NaN, 1000L, 50L), (Double.NaN, 1001L, 60L))
    val df = rows.toDF("a", "id", "x")
    for (asc <- Seq(true, false)) {
      val ord = if (asc) col("a").asc else col("a").desc
      val w = Window.orderBy(ord, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = df.select(col("id"), sum(col("x")).over(w).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = PrefixSum.runningTotalsOrdered(df,
          Seq(("a", asc), ("id", true)), Seq("x"), 8)
        .select(col("id"), col("cum_x"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"NaN ordered cumsum mismatch asc=$asc")
    }
  }
}
