package graft.plans

import graft.SparkSpec
import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join matches hand-checked semantics incl. misses and null values") {
    val trades = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L),
      (4L, "B", 5L), (5L, "C", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 9L, Some(1.0)), ("A", 20L, None), ("A", 30L, Some(3.0)),
      ("B", 6L, Some(9.9))) // B quote AFTER the B trade; C has no quotes
      .toDF("sym", "t", "px")

    val out = AsOfJoin.backward(trades, quotes, by = Seq("sym"), on = "t",
      rightValueCols = Seq("px"))
      .orderBy("trade_id").collect()

    assert(out.length == 5)
    assert(out(0).getDouble(3) == 1.0)  // t=10 -> quote t=9
    assert(out(1).isNullAt(3))          // t=20 -> quote t=20 carries its OWN null px
    assert(out(2).getDouble(3) == 3.0)  // t=35 -> quote t=30
    assert(out(3).isNullAt(3))          // B: no quote at/before t=5
    assert(out(4).isNullAt(3))          // C: no quotes at all
  }

  test("native exec agrees with the union+window composition on events (self-join shape)") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"), col("p_event_id"), col("p_value"))
        .orderBy("event_id").collect().map(_.toSeq).toSeq

    val composed = norm(Joins.asofBackward(
      clicks, purchases, by = Seq("user_id"), on = "ts",
      rightValueCols = Seq("p_event_id", "p_value")))
    val native = norm(AsOfJoin.backward(
      clicks, purchases, by = Seq("user_id"), on = "ts",
      rightValueCols = Seq("p_event_id", "p_value")))
    assert(native.nonEmpty && native == composed)
  }

  test("forward direction: earliest right row at-or-after, incl. misses") {
    val trades = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L),
      (4L, "B", 5L), (5L, "C", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 9L, Some(1.0)), ("A", 20L, None), ("A", 30L, Some(3.0)),
      ("B", 6L, Some(9.9)))
      .toDF("sym", "t", "px")

    val out = AsOfJoin.forward(trades, quotes, by = Seq("sym"), on = "t",
      rightValueCols = Seq("px"))
      .orderBy("trade_id").collect()

    assert(out.length == 5)
    assert(out(0).isNullAt(3))          // t=10 -> next quote is t=20 (null px)
    assert(out(1).isNullAt(3))          // t=20 -> quote t=20 itself (null px)
    assert(out(2).isNullAt(3))          // t=35 -> nothing after
    assert(out(3).getDouble(3) == 9.9)  // B: t=5 -> quote t=6
    assert(out(4).isNullAt(3))          // C: no quotes at all
  }

  test("forward agrees with a brute-force reference on the events self-join") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))

    // brute-force reference: per click, min-(ts, p_event_id) purchase
    // at-or-after, via a plain join + row_number
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("p_ts").asc, col("p_event_id").asc)
    val ref = clicks.join(
        purchases.select(col("user_id"), col("ts").as("p_ts"),
          col("p_event_id"), col("p_value")),
        Seq("user_id"), "left")
      .filter(col("p_ts").isNull || col("p_ts") >= col("ts"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("event_id"), col("user_id"), col("p_event_id"), col("p_value"))

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"), col("p_event_id"), col("p_value"))
        .orderBy("event_id").collect().map(_.toSeq).toSeq

    val native = norm(AsOfJoin.forward(
      clicks, purchases, by = Seq("user_id"), on = "ts",
      rightValueCols = Seq("p_event_id", "p_value")))
    // the left-join reference loses clicks whose ONLY purchases are
    // before (all filtered) — re-add them as misses
    val refRows = norm(clicks.join(ref.drop("user_id"), Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("p_event_id"), col("p_value")))
    assert(native.nonEmpty && native == refRows)
  }

  test("tolerance nulls out stale matches but keeps fresh ones") {
    val trades = Seq(
      (1L, "A", 100L), (2L, "A", 200L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 95L, 1.0), ("A", 150L, 2.0), ("B", 10L, 3.0))
      .toDF("sym", "t", "px")

    val out = AsOfJoin.backwardTolerance(trades, quotes, by = Seq("sym"),
      on = "t", rightValueCols = Seq("px"), toleranceUs = 10L)
      .orderBy("trade_id").collect()
    assert(out(0).getDouble(3) == 1.0) // t=100 -> quote 95 (delta 5 <= 10)
    assert(out(1).isNullAt(3))         // t=200 -> quote 150 is stale (50 > 10)
    assert(out(2).isNullAt(3))         // B t=50 -> quote 10 is stale (40 > 10)

    // tolerance 0 means exact-time only
    val exact = AsOfJoin.backwardTolerance(trades, quotes, by = Seq("sym"),
      on = "t", rightValueCols = Seq("px"), toleranceUs = 0L)
      .orderBy("trade_id").collect()
    assert(exact.forall(_.isNullAt(3)))
  }

  test("null `on` never matches, either side, either direction") {
    val trades = Seq(
      (1L, "A", Some(50L)), (2L, "A", None), // null left on
      (3L, "B", Some(50L)))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", None, 7.7), ("A", Some(100L), 8.8), // null right on for A
      ("B", None, 9.9)) // B's ONLY quote has null on
      .toDF("sym", "t", "px")

    val back = AsOfJoin.backward(trades, quotes, by = Seq("sym"), on = "t",
      rightValueCols = Seq("px")).orderBy("trade_id").collect()
    assert(back(0).isNullAt(3)) // A t=50: only earlier quote has null on -> miss
    assert(back(1).isNullAt(3)) // null left on -> miss (not the null-on quote)
    assert(back(2).isNullAt(3)) // B: null-on quote never matches

    val fwd = AsOfJoin.forward(trades, quotes, by = Seq("sym"), on = "t",
      rightValueCols = Seq("px")).orderBy("trade_id").collect()
    assert(fwd(0).getDouble(3) == 8.8) // A t=50 -> t=100, skipping the null
    assert(fwd(1).isNullAt(3))         // null left on -> miss
    assert(fwd(2).isNullAt(3))         // B: null-on quote never matches
  }

  test("empty by-key: global as-of join over one series (AllTuples merge)") {
    val trades = Seq((1L, 10L), (2L, 25L), (3L, 5L)).toDF("trade_id", "t")
    val quotes = Seq((9L, 1.0), (20L, 2.0)).toDF("t", "px")
    val out = AsOfJoin.backward(trades, quotes, by = Seq.empty, on = "t",
      rightValueCols = Seq("px"))
      .orderBy("trade_id").collect()
    assert(out(0).getDouble(2) == 1.0)  // t=10 -> quote t=9
    assert(out(1).getDouble(2) == 2.0)  // t=25 -> quote t=20
    assert(out(2).isNullAt(2))          // t=5 -> none
  }

  test("physical plan: AsOfJoinExec with Catalyst-planned exchanges/sorts, no window") {
    val trades = Seq((1L, "A", 10L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 9L, 1.0)).toDF("sym", "t", "px")
    val df = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("px"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan) // exec node (Spark strips "Exec")
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("mismatched on/by column types are rejected loudly, every direction") {
    // the exec reads both sides' cells with orderings keyed on the LEFT
    // attribute types — an int/long mismatch would silently misread the
    // right cells rather than error (r11 ADVICE finding)
    val l = Seq((1L, "A", 10)).toDF("id", "sym", "t") // t: Int
    val r = Seq(("A", 9L, 1.0)).toDF("sym", "t", "px") // t: Long
    for (build <- Seq(
        () => AsOfJoin.backward(l, r, Seq("sym"), "t", Seq("px")),
        () => AsOfJoin.forward(l, r, Seq("sym"), "t", Seq("px")),
        () => AsOfJoin.backwardTolerance(l, r, Seq("sym"), "t", Seq("px"), 5L))) {
      val e = intercept[IllegalArgumentException](build())
      assert(e.getMessage.contains("same type on both sides"), e.getMessage)
    }
    // by-key mismatch too (the key ordering reads both sides)
    val l2 = Seq((1, 10L)).toDF("k", "t")
    val r2 = Seq((1L, 9L, 1.0)).toDF("k", "t", "px")
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.backward(l2, r2, Seq("k"), "t", Seq("px")))
    assert(e2.getMessage.contains("'k'"), e2.getMessage)
  }
}
