package graft.operators

import graft.SparkSpec
import java.sql.Date

/** Mann–Kendall, Theil–Sen, c-chart, and the Allen relation ladder —
  * the round-13 trend/SPC/interval additions to TimeSeries.
  */
class TrendSpec extends SparkSpec {

  private def daily(rows: Seq[(String, String, Long)]) =
    spark.createDataFrame(rows.map { case (k, d, v) => (k, Date.valueOf(d), v) })
      .toDF("k", "day", "n")

  test("mannKendall: strictly increasing series has S = n_pairs, tau = 1000") {
    val df = daily((1 to 5).map(i => ("up", f"2024-01-$i%02d", i.toLong)))
    val r = TimeSeries.mannKendall(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_obs") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Long]("s_stat") === 10L)
    assert(r.getAs[Long]("s_pm") === 1000L)
    assert(r.getAs[String]("trend") === "up")
  }

  test("mannKendall: hand-computed mixed series") {
    // values 3, 1, 4, 1, 5 → pairs (i<j): sign sums:
    // (3,1)-1 (3,4)+1 (3,1)-1 (3,5)+1 (1,4)+1 (1,1)0 (1,5)+1
    // (4,1)-1 (4,5)+1 (1,5)+1 → S = 3
    val vals = Seq(3L, 1L, 4L, 1L, 5L)
    val df = daily(vals.zipWithIndex.map { case (v, i) =>
      ("m", f"2024-02-${i + 1}%02d", v) })
    val r = TimeSeries.mannKendall(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("s_stat") === 3L)
    assert(r.getAs[Long]("s_pm") === 300L)
    assert(r.getAs[String]("trend") === "up")
  }

  test("mannKendall: single-observation key still emits, with zero pairs") {
    // The r13 seasonal-MK divergence: a stratum with ONE observed day has
    // no pairs but must still contribute its n_obs to re-aggregations.
    val df = daily(Seq(("lone", "2024-04-01", 9L),
      ("pair", "2024-04-01", 1L), ("pair", "2024-04-02", 2L)))
    val out = TimeSeries.mannKendall(df, Seq("k"), "day", "n")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val lone = out("lone")
    assert(lone.getAs[Long]("n_obs") === 1L)
    assert(lone.getAs[Long]("n_pairs") === 0L)
    assert(lone.getAs[Long]("s_stat") === 0L)
    assert(lone.getAs[Long]("s_pm") === 0L)
    assert(lone.getAs[String]("trend") === "flat")
    assert(out("pair").getAs[Long]("n_pairs") === 1L)
  }

  test("mannKendall: constant series is flat with S = 0") {
    val df = daily((1 to 4).map(i => ("c", f"2024-03-$i%02d", 7L)))
    val r = TimeSeries.mannKendall(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("s_stat") === 0L)
    assert(r.getAs[String]("trend") === "flat")
  }

  test("pettitt: clean level shift is located at the last pre-shift day") {
    // 1,1,1,5,5,5 → r = (−3,−3,−3,3,3,3), U = (−3,−6,−9,−6,−3,0):
    // K = 9 at day 3, U negative = level RISE after the change point
    val df = daily(Seq(1L, 1L, 1L, 5L, 5L, 5L).zipWithIndex.map {
      case (v, i) => ("s", f"2024-05-${i + 1}%02d", v) })
    val r = TimeSeries.pettitt(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_obs") === 6L)
    assert(r.getAs[Long]("k_stat") === 9L)
    assert(r.getAs[Date]("cp_day") === Date.valueOf("2024-05-03"))
    assert(r.getAs[Long]("u_at_cp") === -9L)
  }

  test("pettitt: single-observation key emits k_stat 0") {
    val df = daily(Seq(("one", "2024-05-01", 7L)))
    val r = TimeSeries.pettitt(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_obs") === 1L)
    assert(r.getAs[Long]("k_stat") === 0L)
    assert(r.getAs[Long]("u_at_cp") === 0L)
  }

  test("spearmanTrend: monotone series hit ±1000; ties take midranks") {
    val up = daily((1 to 5).map(i => ("up", f"2024-06-$i%02d", 10L + i)))
    val down = daily((1 to 4).map(i => ("dn", f"2024-06-$i%02d", 10L - i)))
    // 1,2,2,4 → avg ranks 1, 2.5, 2.5, 4 → Σd² = 0.5 → ρ = 0.95
    val tied = daily(Seq(1L, 2L, 2L, 4L).zipWithIndex.map {
      case (v, i) => ("tie", f"2024-06-${i + 1}%02d", v) })
    assert(TimeSeries.spearmanTrend(up, Seq("k"), "day", "n")
      .collect().head.getAs[Long]("rho_pm") === 1000L)
    assert(TimeSeries.spearmanTrend(down, Seq("k"), "day", "n")
      .collect().head.getAs[Long]("rho_pm") === -1000L)
    val t = TimeSeries.spearmanTrend(tied, Seq("k"), "day", "n").collect().head
    assert(t.getAs[Long]("sum_d2_sq") === 2L)
    assert(t.getAs[Long]("rho_pm") === 950L)
  }

  test("bartelsRvn: alternation scores > 2, monotone trend < 2") {
    // 1,3,1,3,1 → r2 by day = 4,9,4,9,4: num = 100, den = 30 → 3333
    val alt = daily(Seq(1L, 3L, 1L, 3L, 1L).zipWithIndex.map {
      case (v, i) => ("alt", f"2024-07-${i + 1}%02d", v) })
    val a = TimeSeries.bartelsRvn(alt, Seq("k"), "day", "n").collect().head
    assert(a.getAs[Long]("nm_num") === 100L)
    assert(a.getAs[Long]("nm_den") === 30L)
    assert(a.getAs[Long]("rvn_x1000") === 3333L)
    // 1..5 monotone → r2 = 2,4,6,8,10: num = 16, den = 40 → 400
    val up = daily((1 to 5).map(i => ("up", f"2024-07-$i%02d", i.toLong)))
    val u = TimeSeries.bartelsRvn(up, Seq("k"), "day", "n").collect().head
    assert(u.getAs[Long]("rvn_x1000") === 400L)
    // constant series: denominator 0 → 0
    val c = daily((1 to 4).map(i => ("c", f"2024-07-$i%02d", 7L)))
    assert(TimeSeries.bartelsRvn(c, Seq("k"), "day", "n")
      .collect().head.getAs[Long]("rvn_x1000") === 0L)
  }

  test("bordaFuse: doubled midranks sum across ballots, ties split fairly") {
    val ballots = spark.createDataFrame(Seq(
      ("b1", "a", 3L), ("b1", "b", 2L), ("b1", "c", 1L),
      ("b2", "a", 3L), ("b2", "b", 1L), ("b2", "c", 2L)))
      .toDF("ballot", "cand", "score")
    val out = graft.operators.Retrieval.bordaFuse(ballots, "ballot", "cand", "score")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("borda_x2") === 12L)
    assert(out("b").getAs[Long]("borda_x2") === 6L)
    assert(out("c").getAs[Long]("borda_x2") === 6L)
    assert(out("a").getAs[Long]("final_rank") === 1L)
    assert(out("b").getAs[Long]("final_rank") === 2L) // tie → cand asc
    assert(out("c").getAs[Long]("final_rank") === 3L)
    // in-ballot tie: a=b=2 share doubled rank 5
    val tied = spark.createDataFrame(Seq(
      ("b1", "a", 2L), ("b1", "b", 2L), ("b1", "c", 1L)))
      .toDF("ballot", "cand", "score")
    val t = graft.operators.Retrieval.bordaFuse(tied, "ballot", "cand", "score")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("borda_x2")).toMap
    assert(t === Map("a" -> 5L, "b" -> 5L, "c" -> 2L))
  }

  test("copeland: pairwise majority wins, ties score zero both sides") {
    // 3 ballots over a,b,c: a beats b 2-1, a beats c 2-1, b ties c 1-1
    val ballots = spark.createDataFrame(Seq(
      ("b1", "a", 3L), ("b1", "b", 2L), ("b1", "c", 1L),
      ("b2", "a", 3L), ("b2", "b", 1L), ("b2", "c", 2L),
      ("b3", "a", 1L), ("b3", "b", 3L), ("b3", "c", 3L)))
      .toDF("ballot", "cand", "score")
    val out = graft.operators.Retrieval.copeland(ballots, "ballot", "cand", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("wins"), r.getAs[Long]("losses"),
          r.getAs[Long]("copeland"), r.getAs[Long]("final_rank")))).toMap
    assert(out("a") === ((2L, 0L, 2L, 1L)))
    assert(out("b") === ((0L, 1L, -1L, 2L))) // tie vs c → 0; loss vs a
    assert(out("c") === ((0L, 1L, -1L, 3L)))
  }

  test("minimaxCondorcet: the Condorcet winner has a negative worst defeat") {
    // same ballots as the copeland spec: a beats b 2-1 and c 2-1 (worst
    // defeat margin −1), b ties c 1-1 and loses to a 1-2 (worst +1)
    val ballots = spark.createDataFrame(Seq(
      ("b1", "a", 3L), ("b1", "b", 2L), ("b1", "c", 1L),
      ("b2", "a", 3L), ("b2", "b", 1L), ("b2", "c", 2L),
      ("b3", "a", 1L), ("b3", "b", 3L), ("b3", "c", 3L)))
      .toDF("ballot", "cand", "score")
    val out = graft.operators.Retrieval
      .minimaxCondorcet(ballots, "ballot", "cand", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("worst_defeat"), r.getAs[Long]("final_rank")))).toMap
    assert(out("a") === ((-1L, 1L)))
    assert(out("b") === ((1L, 2L))) // tie vs c = 0 defeat; loss to a = +1
    assert(out("c") === ((1L, 3L)))
  }

  test("kAnonymity: min group size, below-k counts, l-diversity") {
    val df = spark.createDataFrame(Seq(
      ("x", 1L, 10L), ("x", 1L, 11L), ("x", 1L, 12L), // group (x,1): n=3, l=3
      ("x", 2L, 10L), ("x", 2L, 10L),                 // group (x,2): n=2, l=1
      ("y", 1L, 20L)))                                // group (y,1): n=1, l=1
      .toDF("qi1", "qi2", "sens")
    val r = graft.operators.Integrity.kAnonymity(
      df, Seq("qi1", "qi2"), "sens", k = 2L).collect().head
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("min_group_size") === 1L)
    assert(r.getAs[Long]("n_groups_below_k") === 1L)
    assert(r.getAs[Long]("n_rows_below_k") === 1L)
    assert(r.getAs[Long]("l_min") === 1L)
    assert(!r.getAs[Boolean]("k_anonymous"))
  }

  test("hodgesLehmann: lower median of Walsh sums, doubled") {
    // {1,2,3}: sums i≤j = {2,3,4,4,5,6} → rank 3 of 6 → 4 (HL = 2)
    val df = daily(Seq(1L, 2L, 3L).zipWithIndex.map {
      case (v, i) => ("hl", f"2024-08-${i + 1}%02d", v) })
    val r = TimeSeries.hodgesLehmann(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("hl_x2") === 4L)
  }

  test("sign-bit index round-trip equals the ad-hoc signBitTopK") {
    import spark.implicits._
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        math.sin(i * 7.3 + j * 1.7).toFloat))
    }
    val df = vecs.toDF("id", "v")
    val corpus = df.filter($"id" >= 2)
    val queries = df.filter($"id" < 2)
    val dir = s"/tmp/graft_test_sign_index_${System.nanoTime()}"
    Similarity.writeSignIndex(corpus, "id", "v", dir)
    val idx = Similarity.querySignIndex(spark, dir, queries, "id", "v",
      k = 3, prefilterK = 6).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).sorted
    val adhoc = Similarity.signBitTopK(corpus, queries, "id", "v", "id",
      k = 3, prefilterK = 6).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).sorted
    assert(idx.nonEmpty)
    assert(idx === adhoc)
  }

  test("theilSenSlope: exact linear series recovers the slope, scaled") {
    // v = 10 + 3·t → every pairwise slope is exactly 3 → median 3000
    val df = daily((0 to 6).map(i => ("lin", f"2024-01-${i + 1}%02d", 10L + 3 * i)))
    val r = TimeSeries.theilSenSlope(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_pairs") === 21L)
    assert(r.getAs[Long]("slope_scaled") === 3000L)
  }

  test("theilSenSlope: one wild outlier does not move the median slope") {
    // linear slope 2 plus one spike; the median of pair slopes stays 2000
    val base = (0 to 8).map(i => ("rob", f"2024-01-${i + 1}%02d",
      if (i == 4) 1000L else 20L + 2 * i))
    val r = TimeSeries.theilSenSlope(daily(base), Seq("k"), "day", "n")
      .collect().head
    assert(r.getAs[Long]("slope_scaled") === 2000L)
  }

  test("cChart: alarm iff count exceeds mean + sigma*sqrt(mean), exactly") {
    // 9 days at 100 + one day at 130: tot=1030, nd=10, mean=103,
    // 2σ band ≈ 103 + 2·10.15 = 123.3 → 130 alarms, 100s do not.
    val df = daily((1 to 9).map(i => ("t", f"2024-04-$i%02d", 100L)) :+
      (("t", "2024-04-10", 130L)))
    val rows = TimeSeries.cChart(df, Seq("k"), "day", "n", sigma = 2).collect()
    val alarms = rows.filter(_.getAs[Boolean]("alarm")).map(_.getAs[Long]("n")).toSeq
    assert(alarms === Seq(130L))
    // tighten to the boundary: with sigma=3, 130 is inside (103+30.4) → no alarm
    val none = TimeSeries.cChart(df, Seq("k"), "day", "n", sigma = 3).collect()
    assert(!none.exists(_.getAs[Boolean]("alarm")))
  }

  test("recordDays: hand-computed record highs and lows") {
    // 5, 3, 7, 7, 9, 2 → highs at 5 (first), 7, 9 = 3; lows at 5, 3, 2 = 3
    val vals = Seq(5L, 3L, 7L, 7L, 9L, 2L)
    val df = daily(vals.zipWithIndex.map { case (v, i) =>
      ("r", f"2024-05-${i + 1}%02d", v) })
    val r = TimeSeries.recordDays(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Long]("n_record_highs") === 3L)
    assert(r.getAs[Long]("n_record_lows") === 3L)
  }

  test("recordDays: monotone series is all highs, one low") {
    val df = daily((1 to 5).map(i => ("m", f"2024-06-$i%02d", i.toLong)))
    val r = TimeSeries.recordDays(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_record_highs") === 5L)
    assert(r.getAs[Long]("n_record_lows") === 1L)
  }

  test("turningPoints: alternating series turns at every interior point") {
    // 1, 5, 1, 5, 1 → interior 3, all turning; excess = 9 - 6 = 3
    val vals = Seq(1L, 5L, 1L, 5L, 1L)
    val df = daily(vals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-07-${i + 1}%02d", v) })
    val r = TimeSeries.turningPoints(df, Seq("k"), "day", "n").collect().head
    assert(r.getAs[Long]("n_interior") === 3L)
    assert(r.getAs[Long]("n_turning") === 3L)
    assert(r.getAs[Long]("tp_excess_x3") === 3L)
  }

  test("turningPoints: monotone series has zero turns; ties are not extrema") {
    val mono = daily((1 to 6).map(i => ("m", f"2024-08-$i%02d", i.toLong)))
    val rm = TimeSeries.turningPoints(mono, Seq("k"), "day", "n").collect().head
    assert(rm.getAs[Long]("n_turning") === 0L)
    // 1, 4, 4, 1: interior rows are the two 4s — neither is a STRICT
    // extremum against its equal neighbor
    val ties = daily(Seq(1L, 4L, 4L, 1L).zipWithIndex.map { case (v, i) =>
      ("t", f"2024-09-${i + 1}%02d", v) })
    val rt = TimeSeries.turningPoints(ties, Seq("k"), "day", "n").collect().head
    assert(rt.getAs[Long]("n_turning") === 0L)
  }

  test("allenRelation classifies all 13 relations") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      // (a1, a2, b1, b2, expected)
      (1L, 2L, 3L, 4L, "before"),
      (3L, 4L, 1L, 2L, "after"),
      (1L, 2L, 2L, 3L, "meets"),
      (2L, 3L, 1L, 2L, "met_by"),
      (1L, 3L, 2L, 4L, "overlaps"),
      (2L, 4L, 1L, 3L, "overlapped_by"),
      (1L, 2L, 1L, 3L, "starts"),
      (1L, 3L, 1L, 2L, "started_by"),
      (2L, 3L, 1L, 3L, "finishes"),
      (1L, 3L, 2L, 3L, "finished_by"),
      (2L, 3L, 1L, 4L, "during"),
      (1L, 4L, 2L, 3L, "contains"),
      (1L, 2L, 1L, 2L, "equals"))
    val df = spark.createDataFrame(cases).toDF("a1", "a2", "b1", "b2", "want")
    val got = df.withColumn("rel", TimeSeries.allenRelation(
      col("a1"), col("a2"), col("b1"), col("b2"))).collect()
    got.foreach { r =>
      assert(r.getAs[String]("rel") === r.getAs[String]("want"),
        s"(${r.getLong(0)},${r.getLong(1)}) vs (${r.getLong(2)},${r.getLong(3)})")
    }
  }

  test("allenRelation: degenerate point intervals classify via equality arms") {
    import org.apache.spark.sql.functions._
    // Degenerate intervals satisfy several textbook relations at once;
    // the ladder's arm order decides (meets/met_by win over starts/
    // finishes for a point touching an endpoint) — pinned here.
    val df = spark.createDataFrame(Seq(
      (5L, 5L, 5L, 5L, "equals"),
      (5L, 5L, 5L, 7L, "meets"),
      (5L, 5L, 3L, 5L, "met_by"),
      (5L, 5L, 4L, 6L, "during"))).toDF("a1", "a2", "b1", "b2", "want")
    df.withColumn("rel", TimeSeries.allenRelation(
        col("a1"), col("a2"), col("b1"), col("b2"))).collect()
      .foreach(r => assert(r.getAs[String]("rel") === r.getAs[String]("want")))
  }
}
