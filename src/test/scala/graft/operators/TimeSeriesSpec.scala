package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: (String, String, java.lang.Double)*) = {
    spark.createDataFrame(rows).toDF("k", "d", "v")
      .select(col("k"), to_date(col("d")).as("day"), col("v"))
  }

  test("gapFillDaily completes the spine per key and carries the last value") {
    val df = daily(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-02-10", 7.0))
    val out = TimeSeries.gapFillDaily(df, Seq("k"), "day", Seq("v"))
      .orderBy("k", "day").collect()
    // key a spans 4 days, key b spans 1 — per-key ranges, not the global one
    assert(out.length === 5)
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    // v is null on gap days; v_filled carries 1.0 across them
    assert(a.map(r => Option(r.getAs[java.lang.Double]("v"))).toSeq ===
      Seq(Some(1.0), None, None, Some(4.0)))
    assert(a.map(_.getAs[Double]("v_filled")).toSeq === Seq(1.0, 1.0, 1.0, 4.0))
  }

  test("leading nulls stay null after the fill") {
    val df = daily(("a", "2024-01-01", null), ("a", "2024-01-03", 3.0))
    val out = TimeSeries.gapFillDaily(df, Seq("k"), "day", Seq("v"))
      .orderBy("day").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("v_filled"))).toSeq ===
      Seq(None, None, Some(3.0)))
  }

  test("ewmaDyadic folds the ordered recurrence exactly") {
    // series 8, 4, 2 at α=1/2: s1=8, s2=(8+4)/2=6, s3=(6+2)/2=4 — every
    // step an exact dyadic halving
    val df = daily(
      ("a", "2024-01-01", 8.0), ("a", "2024-01-02", 4.0),
      ("a", "2024-01-03", 2.0), ("b", "2024-01-05", 9.0))
    val out = TimeSeries.ewmaDyadic(df, Seq("k"), "day", "v", halvings = 1)
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("a", 3L, 4.0), ("b", 1L, 9.0)))
  }

  test("ewmaDyadic orders by the sort key, not input order") {
    // rows arrive reversed; the fold must still run 8 → 4 → 2
    val df = daily(
      ("a", "2024-01-03", 2.0), ("a", "2024-01-02", 4.0),
      ("a", "2024-01-01", 8.0))
    val out = TimeSeries.ewmaDyadic(df, Seq("k"), "day", "v", halvings = 1)
      .collect()
    assert(out.head.getDouble(2) === 4.0)
  }

  test("cusumUpper accumulates upward drift and clamps at zero") {
    // tgt=10, slack=2: d=-2,-12,8,8 → S=-2,-14,-6,2; min(0,minS)=-2,-14,-14,-14
    // → c⁺=0,0,8,16; threshold 10 alarms only the last row
    val df = daily(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 0.0),
      ("a", "2024-01-03", 20.0), ("a", "2024-01-04", 20.0))
      .select(col("k"), col("day"), col("v").cast("long").as("v"))
    val out = TimeSeries.cusumUpper(df, Seq("k"), Seq("day"), "v",
        slack = 2L, threshold = 10L)
      .orderBy("day").collect()
    assert(out.map(_.getAs[Long]("c_plus")).toSeq === Seq(0L, 0L, 8L, 16L))
    assert(out.map(_.getAs[Boolean]("alarm")).toSeq ===
      Seq(false, false, false, true))
  }

  test("cusumUpper and ewmaDyadic each plan exactly one exchange") {
    val df = daily(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("b", "2024-01-03", 3.0))
      .select(col("k"), col("day"), col("v").cast("long").as("v"))
    // three stacked window passes over one partitioning → one shuffle
    val cusumPlan = TimeSeries.cusumUpper(df, Seq("k"), Seq("day"), "v", 0L, 1L)
      .queryExecution.executedPlan.toString
    assert("Exchange ".r.findAllIn(cusumPlan).length == 1, cusumPlan)
    // the fold happens inside one partial+final aggregate → one shuffle
    val ewmaPlan = TimeSeries.ewmaDyadic(df, Seq("k"), "day", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange ".r.findAllIn(ewmaPlan).length == 1, ewmaPlan)
  }

  test("cusumUpper never goes negative on downward drift") {
    val df = daily(("a", "2024-01-01", 20.0), ("a", "2024-01-02", 0.0))
      .select(col("k"), col("day"), col("v").cast("long").as("v"))
    val out = TimeSeries.cusumUpper(df, Seq("k"), Seq("day"), "v",
        slack = 0L, threshold = 5L)
      .orderBy("day").collect()
    assert(out.map(_.getAs[Long]("c_plus")).toSeq === Seq(0L, 0L))
  }

  test("interpolateDaily draws the straight line across interior gaps") {
    // 0 → (gap, gap) → 30: the two gap days take 10 and 20
    val df = daily(
      ("a", "2024-01-01", 0.0), ("a", "2024-01-04", 30.0),
      ("b", "2024-02-10", 7.0))
      .select(col("k"), col("day"), col("v").cast("long").as("v"))
    val out = TimeSeries.interpolateDaily(df, Seq("k"), "day", "v")
      .orderBy("k", "day").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getAs[Double]("v_interp")).toSeq === Seq(0.0, 10.0, 20.0, 30.0))
    assert(out.filter(_.getString(0) == "b").head.getAs[Double]("v_interp") === 7.0)
  }

  test("interpolateDaily never extrapolates past the known range") {
    // leading null day cannot appear (spine starts at the first KNOWN
    // day) — but a null VALUE on the first day leaves that edge null
    val df = daily(
      ("a", "2024-01-01", null), ("a", "2024-01-02", 4.0),
      ("a", "2024-01-04", 8.0))
      .select(col("k"), col("day"), col("v").cast("long").as("v"))
    val out = TimeSeries.interpolateDaily(df, Seq("k"), "day", "v")
      .orderBy("day").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("v_interp"))).toSeq ===
      Seq(None, Some(4.0), Some(6.0), Some(8.0)))
  }

  test("timeWeightedAvg holds each value until the next sample") {
    // v=10 held 1s, v=0 held 3s, v=100 terminal (zero span):
    // area = 10·1 + 0·3 = 10, span 4 → twa 2.5 — a plain AVG says 36.7
    val df = Seq(
      ("a", 0L, 10L), ("a", 1L, 0L), ("a", 4L, 100L),
      ("b", 7L, 42L)) // single sample → twa = value
      .toDF("k", "t", "v")
    val out = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq(("a", 10L, 4L, 2.5), ("b", 0L, 0L, 42.0)))
  }

  test("timeWeightedAvg: equal timestamps hold zero width under tie order") {
    val df = Seq(
      ("a", 1L, 0L, 10L), ("a", 2L, 0L, 999L), // tied ts: 999 holds 0s
      ("a", 3L, 2L, 4L))
      .toDF("id", "k2", "t", "v") // k2 unused; id is the tiebreak
      .select(lit("a").as("k"), col("t"), col("v"), col("id"))
    val out = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v",
        tieCols = Seq("id"))
      .collect()
    // area = 10·0 (tied) + 999·2 = 1998, span 2 → twa 999
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ===
      Seq((1998L, 2L, 999.0)))
  }

  test("ewmaDyadic honors deeper halvings (α = 1/4)") {
    // s1=8, s2=8+(0-8)/4=6: α=1/4 weights history 3:1
    val df = daily(("a", "2024-01-01", 8.0), ("a", "2024-01-02", 0.0))
    val out = TimeSeries.ewmaDyadic(df, Seq("k"), "day", "v", halvings = 2)
      .collect()
    assert(out.head.getDouble(2) === 6.0)
  }

  test("holtLinear replays the hand-traced integer recurrence") {
    // series 10, 20, 30 (a clean +10 trend):
    // t1: l=10, b=0
    // t2: l=(20+10+0) div 2=15, b=(0+(15−10)) div 2=2
    // t3: l=(30+15+2) div 2=23, b=(2+(23−15)) div 2=5  → forecast 28
    val df = daily(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 30.0))
    val out = TimeSeries.holtLinear(df, Seq("k"), "day", "v").collect()
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((3L, 23L, 5L, 28L)))
  }

  test("holtLinear: single point is its own level with zero trend") {
    val df = daily(("a", "2024-01-01", 7.0))
    val r = TimeSeries.holtLinear(df, Seq("k"), "day", "v").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((1L, 7L, 0L, 7L)))
  }

  test("holtLinear truncates negative trend like both engines' div") {
    // declining series 30, 20: l2=(20+30+0) div 2=25,
    // b2=(0+(25−30)) div 2 = (−5) div 2 = −2 (TRUNCATION, not floor −3)
    val df = daily(("a", "2024-01-01", 30.0), ("a", "2024-01-02", 20.0))
    val r = TimeSeries.holtLinear(df, Seq("k"), "day", "v").collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((25L, -2L, 23L)))
  }

  test("holtWinters replays a hand-traced period-2 recurrence") {
    // m=2, series 10, 20, 30:
    // t1: l=10, b=0, s=[0,0]
    // t2 (slot 1): l=((20−0)+(10+0))/2=15, b=(0+5)/2=2,
    //              s[1]=(0+(20−15))/2=2 → s=[0,2]
    // t3 (slot 0): l=((30−0)+(15+2))/2=23, b=(2+8)/2=5,
    //              s[0]=(0+(30−23))/2=3 → s=[3,2]
    // forecast slot = t=3 → 3%2=1 → s[1]=2 → 23+5+2=30
    val df = daily(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 30.0))
    val r = TimeSeries.holtWinters(df, Seq("k"), "day", "v", period = 2)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((3L, 23L, 5L, 2L, 30L)))
  }

  test("holtWinters matches a sequential Scala fold with period 7") {
    val vals = Seq(12L, 5L, 9L, 30L, 2L, 18L, 25L, 11L, 6L, 8L, 31L, 4L,
      17L, 24L, 13L, 5L, 10L, 29L, 1L, 19L, 26L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("k", f"2024-03-${i + 1}%02d", Double.box(v.toDouble))
    }
    val df = daily(rows: _*)
    var l = vals.head; var b = 0L; var t = 1L
    val s = Array.fill(7)(0L)
    vals.tail.foreach { x =>
      val idx = (t % 7).toInt
      val ln = ((x - s(idx)) + (l + b)) / 2
      b = (b + (ln - l)) / 2
      s(idx) = (s(idx) + (x - ln)) / 2
      l = ln; t += 1
    }
    val r = TimeSeries.holtWinters(df, Seq("k"), "day", "v", period = 7)
      .collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((l, b, s((t % 7).toInt))))
  }

  test("holtLinear matches a sequential Scala fold on a longer series") {
    val vals = Seq(3L, 9L, 1L, 14L, 7L, 7L, 20L, 0L, 5L, 12L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("k", f"2024-02-${i + 1}%02d", Double.box(v.toDouble))
    }
    val df = daily(rows: _*)
    var l = vals.head; var b = 0L
    vals.tail.foreach { x =>
      val ln = (x + l + b) / 2 // Scala / on Long truncates — same as div
      b = (b + (ln - l)) / 2
      l = ln
    }
    val r = TimeSeries.holtLinear(df, Seq("k"), "day", "v").collect().head
    assert((r.getLong(2), r.getLong(3)) === ((l, b)))
  }

  test("ljungBox matches the brute-force fixed double tree") {
    val vals = Seq(5L, 9L, 2L, 14L, 7L, 3L, 20L, 1L, 6L, 11L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("k", f"2024-03-${i + 1}%02d", Double.box(v.toDouble))
    }
    val df = daily(rows: _*).select(col("k"), col("day"),
      col("v").cast("long").as("c"))
    val r = TimeSeries.ljungBox(df, Seq("k"), "day", "c").collect().head
    val n = vals.size
    val s = vals.sum
    val cd = vals.map(v => BigInt(n) * v - s)
    val den = cd.map(x => x * x).sum
    def num(k: Int): BigInt =
      cd.drop(k).zip(cd.dropRight(k)).map { case (a, b) => a * b }.sum
    val terms = (1 to 3).map(k =>
      (num(k) * num(k)).toDouble / (den * den * (n - k)).toDouble)
    val want = (BigInt(n) * (n + 2)).toDouble * ((terms(0) + terms(1)) + terms(2))
    assert(r.getAs[Long]("n_points") === n.toLong)
    assert(r.getAs[Long]("den") === den.toLong)
    assert((1 to 3).map(k => r.getAs[Long](s"num$k")) === (1 to 3).map(num(_).toLong))
    assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("lb_q")) ===
      java.lang.Double.doubleToLongBits(want))
  }

  test("sax buckets weekly PAA means against the exact quartiles") {
    // 14 days, seg len 7. values 1..14: q1 = v@ceil(14/4)=v@4=4,
    // q2 = v@7 = 7, q3 = v@ceil(42/4)=v@11 = 11. seg0 mean 4 <= q1*1?
    // sum 28 vs 4*7=28 -> 'a'; seg1 sum 77 vs q3*7=77 -> 'c'
    val rows = (1 to 14).map(i => ("k", f"2024-01-$i%02d", Double.box(i.toDouble)))
    val df = daily(rows: _*).select(col("k"), col("day"),
      col("v").cast("long").as("c"))
    val r = TimeSeries.sax(df, Seq("k"), "day", "c").collect().head
    assert((r.getAs[Long]("q1"), r.getAs[Long]("q2"), r.getAs[Long]("q3")) ===
      ((4L, 7L, 11L)))
    assert(r.getAs[Long]("n_segments") === 2L)
    assert(r.getAs[String]("sax") === "ac")
  }

  test("sax: short tail segment uses its own count in the cross-multiplication") {
    // 9 days of value 5 then a single huge day: tail segment (2 days)
    // mean is (5+100)/2 -> above q3
    val rows = ((1 to 9).map(i => ("k", f"2024-02-$i%02d", Double.box(5.0))) :+
      (("k", "2024-02-10", Double.box(100.0))))
    val df = daily(rows: _*).select(col("k"), col("day"),
      col("v").cast("long").as("c"))
    val r = TimeSeries.sax(df, Seq("k"), "day", "c").collect().head
    assert(r.getAs[Long]("n_points") === 10L)
    assert(r.getAs[String]("sax").length === 2)
    assert(r.getAs[String]("sax").last === 'd')
  }

  test("ljungBox: constant and too-short series emit NULL Q") {
    val df = daily(("a", "2024-01-01", 5.0), ("a", "2024-01-02", 5.0),
      ("a", "2024-01-03", 5.0), ("a", "2024-01-04", 5.0), ("a", "2024-01-05", 5.0),
      ("b", "2024-01-01", 1.0), ("b", "2024-01-02", 9.0))
      .select(col("k"), col("day"), col("v").cast("long").as("c"))
    val out = TimeSeries.ljungBox(df, Seq("k"), "day", "c")
      .orderBy("k").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("lb_q"))))
    // the short key's lag-2/3 witnesses render 0, not null
    assert(out(1).getAs[Long]("num2") === 0L)
    assert(out(1).getAs[Long]("num3") === 0L)
  }
}
