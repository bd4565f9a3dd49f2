package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("regression recovers an exactly linear relationship") {
    // y = 2x + 1, exactly representable — slope/intercept/corr are exact
    val df = spark.createDataFrame(
      (0 to 10).map(x => ("g", x, 2.0 * x + 1.0))).toDF("k", "x", "y")
    val r = Stats.regression(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("corr") === 1.0)
  }

  test("degenerate regression groups (n=1, constant x) report NULL, not NaN/inf") {
    val df = spark.createDataFrame(Seq(
      ("one", 5, 1.0),                     // n = 1
      ("constx", 3, 1.0), ("constx", 3, 2.0))) // var(x) = 0
      .toDF("k", "x", "y")
    val out = Stats.regression(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("one", "constx"); c <- Seq("slope", "intercept", "corr"))
      assert(out(g).isNullAt(out(g).fieldIndex(c)), s"$g.$c should be null")
  }

  test("wilcoxonSignedRank: hand-computed ties + zero-diff drop") {
    // diffs x−y = {2, −2, 2, 3, 0}: the zero drops (n = 4); |d| run
    // {2,2,2} takes doubled rank 1+3 = 4 each, |3| takes 4·2 = 8 →
    // w⁺·2 = 4+4+8 = 16, w⁻·2 = 4, and 16+4 = 4·5 (the identity).
    val df = spark.createDataFrame(Seq(
      ("g", 5L, 3L), ("g", 3L, 5L), ("g", 7L, 5L), ("g", 9L, 6L), ("g", 4L, 4L)))
      .toDF("k", "x", "y")
    val r = Stats.wilcoxonSignedRank(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Long]("w_plus_x2") === 16L)
    assert(r.getAs[Long]("w_minus_x2") === 4L)
  }

  test("signTest counts signs and the binomial tail statistic") {
    val df = spark.createDataFrame(Seq(
      ("g", 5L, 3L), ("g", 3L, 5L), ("g", 7L, 5L), ("g", 9L, 6L), ("g", 4L, 4L)))
      .toDF("k", "x", "y")
    val r = Stats.signTest(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("sign_stat") === 2L)
    assert(r.getAs[Long]("b_stat") === 1L)
  }

  test("ksTwoSample: disjoint supports give D = 1, interleaved give 1/2") {
    val df = spark.createDataFrame(Seq(
      // disjoint: A = {1,2,3}, B = {4,5,6} → D = 1
      ("dis", true, 1L), ("dis", true, 2L), ("dis", true, 3L),
      ("dis", false, 4L), ("dis", false, 5L), ("dis", false, 6L),
      // interleaved: A = {1,3}, B = {2,4} → D = 1/2
      ("mix", true, 1L), ("mix", true, 3L),
      ("mix", false, 2L), ("mix", false, 4L)))
      .toDF("k", "in_a", "v")
    val out = Stats.ksTwoSample(df, Seq("k"), "in_a", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("dis").getAs[Long]("d_num") === 9L)
    assert(out("dis").getAs[Long]("d_pm") === 1000L)
    assert(out("mix").getAs[Long]("d_num") === 2L)
    assert(out("mix").getAs[Long]("d_pm") === 500L)
  }

  test("cramerVonMises: separated singletons give T = 1/4; identical samples 0") {
    // A={1}, B={2}: gap 1 at v=1, 0 at v=2 → T = (1·1/4)·1 = 0.25
    val df = spark.createDataFrame(Seq(
      ("g", true, 1L), ("g", false, 2L))).toDF("k", "in_a", "v")
    val r = Stats.cramerVonMises(df, Seq("k"), "in_a", "v").collect().head
    assert(r.getAs[Long]("t_x1000") === 250L)
    // identical multisets → every ECDF gap is 0
    val same = spark.createDataFrame(Seq(
      ("s", true, 1L), ("s", false, 1L), ("s", true, 7L), ("s", false, 7L)))
      .toDF("k", "in_a", "v")
    val z = Stats.cramerVonMises(same, Seq("k"), "in_a", "v").collect().head
    assert(z.getAs[Long]("t_x1000") === 0L)
  }

  test("mcnemar counts the 2x2 and scores only the discordant cells") {
    val rows = Seq((true, true), (true, false), (true, false), (true, false),
      (false, true), (false, false)).map { case (a, b) => ("g", a, b) }
    val r = Stats.mcnemar(spark.createDataFrame(rows).toDF("k", "a", "b"),
      Seq("k"), "a", "b").collect().head
    assert((r.getAs[Long]("n00"), r.getAs[Long]("n01"),
      r.getAs[Long]("n10"), r.getAs[Long]("n11")) === ((1L, 1L, 3L, 1L)))
    // (3−1)²·1000 / (3+1) = 1000
    assert(r.getAs[Long]("chi2_x1000") === 1000L)
  }

  test("cochranQ: hand-computed k=3 table") {
    // verdicts (1,1,0),(1,0,0),(1,1,1),(0,0,0): C = (3,2,1), S = 6,
    // ΣR² = 14, ΣC² = 14 → Q = 2·(3·14 − 36)/(3·6 − 14) = 3
    val rows = Seq((true, true, false), (true, false, false),
      (true, true, true), (false, false, false))
      .map { case (a, b, c) => ("g", a, b, c) }
    val r = Stats.cochranQ(spark.createDataFrame(rows).toDF("k", "v1", "v2", "v3"),
      Seq("k"), Seq("v1", "v2", "v3")).collect().head
    assert(r.getAs[Long]("n_subjects") === 4L)
    assert(r.getAs[Long]("s_total") === 6L)
    assert(r.getAs[Long]("sum_c_sq") === 14L)
    assert(r.getAs[Long]("sum_r2") === 14L)
    assert(r.getAs[Long]("q_x1000") === 3000L)
  }

  test("cochranQ: all-pass / all-fail subjects carry no information") {
    val rows = Seq((true, true, true), (false, false, false))
      .map { case (a, b, c) => ("g", a, b, c) }
    val r = Stats.cochranQ(spark.createDataFrame(rows).toDF("k", "v1", "v2", "v3"),
      Seq("k"), Seq("v1", "v2", "v3")).collect().head
    assert(r.getAs[Long]("q_x1000") === 0L) // denominator kS − ΣR² = 0
  }

  test("friedman: perfect concordance gives W = 1; incomplete blocks drop") {
    // 4 blocks, 3 treatments, always ranked t1 < t2 < t3:
    // R2 = (8,16,24) → χ²F = 8, W = 1. A 5th block missing t3 drops.
    val rows = (1 to 4).flatMap(b => Seq(
      ("b" + b, "t1", 10L), ("b" + b, "t2", 20L), ("b" + b, "t3", 30L))) ++
      Seq(("b5", "t1", 1L), ("b5", "t2", 2L))
    val out = Stats.friedman(
      spark.createDataFrame(rows).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("t1").getAs[Long]("n_blocks") === 4L)
    assert(out("t1").getAs[Long]("r2_sum") === 8L)
    assert(out("t3").getAs[Long]("r2_sum") === 24L)
    assert(out("t2").getAs[Long]("chi2f_x1000") === 8000L)
    assert(out("t2").getAs[Long]("w_pm") === 1000L)
  }

  test("friedman: all-tied blocks give exactly zero, no floor artifact") {
    val rows = (1 to 3).flatMap(b => Seq(
      ("b" + b, "t1", 7L), ("b" + b, "t2", 7L), ("b" + b, "t3", 7L)))
    val out = Stats.friedman(
      spark.createDataFrame(rows).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect()
    assert(out.forall(_.getAs[Long]("chi2f_x1000") === 0L))
  }

  test("quade: hand-computed 3-block example with range and value ties") {
    // blocks: b1 A=1 B=2 (range 1 → q2=4), b2 A=3 B=9 (range 6 → q2=6),
    // b3 A=5 B=5 (range 0 → q2=2; within-block tie → zero deviation).
    // S4 = q2·(r2−3): A = (−4, −6, 0), B = (+4, +6, 0) → S_A = −2.5,
    // A-stat = 6.5, B-stat = 25/6, F = 2·(25/6)/(7/3) = 25/7 = 3.571…
    val df = spark.createDataFrame(Seq(
      ("b1", "A", 1L), ("b1", "B", 2L),
      ("b2", "A", 3L), ("b2", "B", 9L),
      ("b3", "A", 5L), ("b3", "B", 5L))).toDF("blk", "t", "v")
    val out = Stats.quade(df, "blk", "t", "v").collect()
      .map(r => r.getAs[String]("t") ->
        (r.getAs[Long]("s4_sum"), r.getAs[Long]("quade_x1000"))).toMap
    assert(out("A") === ((-10L, 3571L)))
    assert(out("B") === ((10L, 3571L)))
  }

  test("ansariBradley: hand-computed no-tie and tie-run cases") {
    // no ties: A = {1, 6}, B = {2, 5}, pooled ranks 1..4 (N=4):
    // scores min(i, 5-i) = (1, 2, 2, 1); A holds ranks 1 and 4 -> AB = 2,
    // ab2_x1000 = 2 * 2 * 1000 = 4000. E[AB] even-N: n1(N+2)/4 = 3 ->
    // e_ab2_x1000 = 1000 * 2 * 6 / 2 = 6000.
    val noTie = spark.createDataFrame(Seq(
      ("k", true, 1L), ("k", true, 6L), ("k", false, 2L), ("k", false, 5L)))
      .toDF("k", "in_a", "v")
    val r1 = Stats.ansariBradley(noTie, Seq("k"), "in_a", "v").collect().head
    assert(r1.getAs[Long]("ab2_x1000") === 4000L)
    assert(r1.getAs[Long]("e_ab2_x1000") === 6000L)
    // tie run crossing the peak: values (1, 3, 3, 3, 9), N=5, scores
    // (1, 2, 3, 2, 1) doubled (2,4,6,4,2); run [2,4] S2 = 14, A holds 1
    // of the 3 -> contrib = floor(14000/3) = 4666; A also holds rank 1
    // (S2=2, m=1 -> 2000). ab2_x1000 = 6666.
    val tie = spark.createDataFrame(Seq(
      ("k", true, 1L), ("k", true, 3L), ("k", false, 3L), ("k", false, 3L),
      ("k", false, 9L))).toDF("k", "in_a", "v")
    val r2 = Stats.ansariBradley(tie, Seq("k"), "in_a", "v").collect().head
    assert(r2.getAs[Long]("ab2_x1000") === 6666L)
    // odd N expectation: 1000*n1*(N+1)^2/(2N) = 1000*2*36/10 = 7200
    assert(r2.getAs[Long]("e_ab2_x1000") === 7200L)
  }

  test("pairwiseMannWhitney: census equals the nested-loop counts per pair") {
    // groups: x = {1, 4, 4}, y = {2, 4}, z = {5}
    val rows = Seq(("x", 1L), ("x", 4L), ("x", 4L), ("y", 2L), ("y", 4L), ("z", 5L))
    val df = spark.createDataFrame(rows.map { case (g, v) => ("k", g, v) })
      .toDF("k", "g", "v")
    val out = Stats.pairwiseMannWhitney(df, Seq("k"), "g", "v")
      .collect().map(r => (r.getAs[String]("g1"), r.getAs[String]("g2")) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("p_gt"),
          r.getAs[Long]("p_lt"), r.getAs[Long]("u2_g1"), r.getAs[Long]("r_rb_pm")))
      .toMap
    def brute(a: Seq[Long], b: Seq[Long]) = {
      val gt = (for (x <- a; y <- b if x > y) yield 1).size.toLong
      val lt = (for (x <- a; y <- b if x < y) yield 1).size.toLong
      val t = (for (x <- a; y <- b if x == y) yield 1).size.toLong
      (a.size.toLong, b.size.toLong, gt, lt, 2 * gt + t,
        (gt - lt) * 1000 / (a.size * b.size))
    }
    val (x, y, z) = (Seq(1L, 4L, 4L), Seq(2L, 4L), Seq(5L))
    assert(out(("x", "y")) === brute(x, y))
    assert(out(("x", "z")) === brute(x, z))
    assert(out(("y", "z")) === brute(y, z))
    assert(out.size === 3)
  }

  test("gkLambda: hand-computed PRE both directions; degenerate margin 0") {
    // cells: r1:(a=8, b=2), r2:(a=3, b=7). N=20.
    // cols->: Σ row maxes = 8+7 = 15; modal col a = 11.
    // λ_rc = (15-11)/(20-11) = 4/9 -> 444
    // rows->: Σ col maxes = 8+7 = 15; modal row = 10.
    // λ_cr = (15-10)/(20-10) = 5/10 -> 500
    val rows = Seq.fill(8)(("r1", "a")) ++ Seq.fill(2)(("r1", "b")) ++
      Seq.fill(3)(("r2", "a")) ++ Seq.fill(7)(("r2", "b"))
    val r = Stats.gkLambda(spark.createDataFrame(rows).toDF("r", "c"), "r", "c")
      .collect().head
    assert(r.getAs[Long]("n_total") === 20L)
    assert(r.getAs[Long]("lambda_rc_pm") === 444L)
    assert(r.getAs[Long]("lambda_cr_pm") === 500L)
    // one column only: modal col = N -> nothing to reduce -> 0
    val deg = Stats.gkLambda(spark.createDataFrame(
      Seq(("r1", "a"), ("r2", "a"))).toDF("r", "c"), "r", "c").collect().head
    assert(deg.getAs[Long]("lambda_rc_pm") === 0L)
  }

  test("youdenJ: hand-computed informedness and signed MCC^2") {
    // n11=6, n00=4, n10=2, n01=3: delta = 24-6 = 18
    // J = 18/(8*7) = 0.3214 -> 321; margins 8,7,9,6
    // MCC^2 = 324/(8*7*9*6) = 324/3024 -> x1e6 = 107142 (positive)
    val rows = Seq.fill(6)((true, true)) ++ Seq.fill(4)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(3)((false, true))
    val r = Stats.youdenJ(spark.createDataFrame(
      rows.map { case (a, b) => ("k", a, b) }).toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect().head
    assert(r.getAs[Long]("j_pm") === 321L)
    assert(r.getAs[Long]("mcc2_x1e6") === 107142L)
    // anti-correlated verdicts carry the sign
    val anti = Seq.fill(5)((true, false)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(1)((true, true)) ++ Seq.fill(1)((false, false))
    val ra = Stats.youdenJ(spark.createDataFrame(
      anti.map { case (a, b) => ("k", a, b) }).toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect().head
    assert(ra.getAs[Long]("mcc2_x1e6") < 0L)
    assert(ra.getAs[Long]("j_pm") < 0L)
  }

  test("hoover: hand-computed inequality; uniform is 0, all-in-one is (n-1)/n") {
    // (10, 20, 30, 40): T=100, n=4; excess = max(0, 4x-100) = (0,0,20,60)
    // -> H = 80/400 = 0.2 -> 200 pm
    val df = spark.createDataFrame(Seq(("k", 10L), ("k", 20L), ("k", 30L),
      ("k", 40L))).toDF("g", "v")
    val r = Stats.hoover(df, Seq("g"), "v").collect().head
    assert(r.getAs[Long]("hoover_pm") === 200L)
    val uni = spark.createDataFrame((1 to 5).map(_ => ("u", 7L))).toDF("g", "v")
    assert(Stats.hoover(uni, Seq("g"), "v").collect().head
      .getAs[Long]("hoover_pm") === 0L)
    // one holder: H = (n-1)/n = 3/4 -> 750
    val one = spark.createDataFrame(Seq(("o", 100L), ("o", 0L), ("o", 0L),
      ("o", 0L))).toDF("g", "v")
    assert(Stats.hoover(one, Seq("g"), "v").collect().head
      .getAs[Long]("hoover_pm") === 750L)
  }

  test("pairwiseTotalVariation: hand-computed mixes incl. a category one side lacks") {
    // g1: a=3 b=1 (N=4); g2: a=1 b=1 c=2 (N=4)
    // gaps x16: |3*4-1*4|=8, |1*4-1*4|=0, |0*4-2*4|=8 -> TV = 16/32 = 0.5
    val rows = Seq(("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "b"), ("g2", "c"), ("g2", "c"))
    val df = spark.createDataFrame(rows).toDF("g", "c")
    val r = Stats.pairwiseTotalVariation(df, "g", "c").collect().head
    assert(r.getAs[String]("g1") === "g1" && r.getAs[String]("g2") === "g2")
    assert(r.getAs[Long]("tv_pm") === 500L)
    // worst single category gap: 8/16 = 0.5 -> 500
    assert(r.getAs[Long]("linf_pm") === 500L)
    // identical mixes -> 0
    val same = spark.createDataFrame(Seq(("x", "a"), ("x", "b"), ("y", "a"),
      ("y", "b"))).toDF("g", "c")
    val z = Stats.pairwiseTotalVariation(same, "g", "c").collect().head
    assert(z.getAs[Long]("tv_pm") === 0L && z.getAs[Long]("linf_pm") === 0L)
  }

  test("oddsRatio: hand-computed 2x2; empty cell renders 0") {
    // n11=6, n00=4, n10=2, n01=3 -> OR = 24/6 = 4 -> 4000
    val rows = Seq.fill(6)((true, true)) ++ Seq.fill(4)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(3)((false, true))
    val df = spark.createDataFrame(rows.map { case (a, b) => ("k", a, b) })
      .toDF("g", "a", "b")
    val r = Stats.oddsRatio(df, Seq("g"), "a", "b").collect().head
    assert(r.getAs[Long]("or_x1000") === 4000L)
    // perfect agreement: discordant cells empty -> undefined -> 0
    val perfect = spark.createDataFrame(Seq(("k", true, true), ("k", false, false)))
      .toDF("g", "a", "b")
    assert(Stats.oddsRatio(perfect, Seq("g"), "a", "b").collect().head
      .getAs[Long]("or_x1000") === 0L)
  }

  test("durbinWatson: alternation ~4, trend ~0, constants 0 (hand-computed)") {
    // alternating 0,1,0,1: e = 4x - 2 = (-2,2,-2,2); den 16, num 48 -> 3000
    val alt = spark.createDataFrame(
      (0 until 4).map(t => ("a", t.toLong, (t % 2).toLong))).toDF("k", "t", "v")
    val rA = Stats.durbinWatson(alt, Seq("k"), "t", "v").collect().head
    assert(rA.getAs[Long]("dw_x1000") === 3000L)
    // monotone 1..4: e = (-6,-2,2,6); den 80, num 48 -> 600 (trend reads
    // as positive autocorrelation — the documented mean-detrend caveat)
    val mono = spark.createDataFrame(
      (1 to 4).map(t => ("m", t.toLong, t.toLong))).toDF("k", "t", "v")
    val rM = Stats.durbinWatson(mono, Seq("k"), "t", "v").collect().head
    assert(rM.getAs[Long]("dw_x1000") === 600L)
    // constant series: zero residual mass -> defined 0
    val const = spark.createDataFrame(
      (1 to 5).map(t => ("c", t.toLong, 7L))).toDF("k", "t", "v")
    assert(Stats.durbinWatson(const, Seq("k"), "t", "v")
      .collect().head.getAs[Long]("dw_x1000") === 0L)
  }

  test("pairwiseKs: per-pair sup gap equals the brute-force ECDF census") {
    val rows = Seq(("x", 1L), ("x", 4L), ("x", 4L), ("y", 2L), ("y", 4L),
      ("z", 5L), ("z", 1L))
    val df = spark.createDataFrame(rows.map { case (g, v) => ("k", g, v) })
      .toDF("k", "g", "v")
    val out = Stats.pairwiseKs(df, Seq("k"), "g", "v")
      .collect().map(r => (r.getAs[String]("g1"), r.getAs[String]("g2")) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("d_num"),
          r.getAs[Long]("d_pm"))).toMap
    def brute(a: Seq[Long], b: Seq[Long]) = {
      val vs = (a ++ b).distinct
      val d = vs.map(v =>
        math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)).max
      (a.size.toLong, b.size.toLong, d, 1000 * d / (a.size * b.size))
    }
    val (x, y, z) = (Seq(1L, 4L, 4L), Seq(2L, 4L), Seq(5L, 1L))
    assert(out(("x", "y")) === brute(x, y))
    assert(out(("x", "z")) === brute(x, z))
    assert(out(("y", "z")) === brute(y, z))
  }

  test("varianceRatio: constant-increment series gives VR exactly 0 variance -> 0") {
    // x_t = 10t: d1 all 10 (V1 = 0 -> vr 0 by the degenerate rule)
    val lin = spark.createDataFrame((1 to 12).map(t => ("k", t.toLong, 10L * t)))
      .toDF("k", "t", "v")
    val r = Stats.varianceRatio(lin, Seq("k"), "t", "v", q = 3).collect().head
    assert(r.getAs[Long]("v1_num") === 0L)
    assert(r.getAs[Long]("vr_x1000") === 0L)
  }

  test("varianceRatio: hand-computed alternating series (mean reversion, VR < 1)") {
    // x = (0,1,0,1,0,1,0,1): d1 = (1,-1,...) 7 diffs, sum -> 1, ss = 7
    // V1 = 7*7 - 1 = 48; q=2: dq = 0 for all 6 -> Vq = 0 -> vr = 0? Vq=0
    // gives vr_x1000 = 0 exactly (perfect mean reversion at lag 2).
    val alt = spark.createDataFrame((0 until 8).map(t => ("k", t.toLong, (t % 2).toLong)))
      .toDF("k", "t", "v")
    val r = Stats.varianceRatio(alt, Seq("k"), "t", "v", q = 2).collect().head
    assert(r.getAs[Long]("n1") === 7L)
    assert(r.getAs[Long]("nq") === 6L)
    assert(r.getAs[Long]("v1_num") === 48L)
    assert(r.getAs[Long]("vq_num") === 0L)
    assert(r.getAs[Long]("vr_x1000") === 0L)
    // and a genuinely trending series: x = t^2 -> d1 grows, dq grows
    // faster; just pin the exact rendering on a tiny case computed by
    // the same formula in Scala
    val xs = Seq(0L, 1L, 4L, 9L, 16L, 25L)
    val sq = spark.createDataFrame(xs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) })
      .toDF("k", "t", "v")
    val d1 = xs.sliding(2).map(p => p(1) - p(0)).toSeq
    val dq = xs.sliding(3).map(p => p(2) - p(0)).toSeq
    def vnum(d: Seq[Long]) = BigInt(d.size) * d.map(x => BigInt(x) * x).sum -
      BigInt(d.sum) * d.sum
    val want = (vnum(dq) * d1.size * d1.size * 1000) /
      (vnum(d1) * 2 * dq.size * dq.size)
    val r2 = Stats.varianceRatio(sq, Seq("k"), "t", "v", q = 2).collect().head
    assert(r2.getAs[Long]("vr_x1000") === want.toLong)
  }

  test("partialCorrelation: per-row |input| >= 1e19 raises; 9e18 stays exact") {
    // Long inputs can never reach the bound (Long.Max ≈ 9.22e18) — the
    // window is double/decimal inputs, where the x·x product would hit
    // the DECIMAL(38,0) ceiling, NULL, and silently shed the row
    // one near-bound row: its x·x ≈ 8.1e37 fits DECIMAL(38,0) and the
    // sums stay under 10³⁸ (two such rows would overflow the SUM, which
    // is a separate, loud failure in ANSI Spark)
    val ok = spark.createDataFrame(Seq(
      (1L, 9.0e18, 1.0, 1.0), (1L, -2.0, 2.0, 3.0), (1L, 3.0, 3.0, 5.0)))
      .toDF("g", "x", "y", "z")
    val rOk = Stats.partialCorrelation(ok, Seq("g"), "x", "y", "z").collect()
    assert(rOk.head.getAs[Long]("n") === 3L)
    val bad = spark.createDataFrame(Seq(
      (1L, 1.0e19, 1.0, 1.0), (1L, 2.0, 2.0, 3.0), (1L, 3.0, 3.0, 5.0)))
      .toDF("g", "x", "y", "z")
    val e = intercept[Exception] {
      Stats.partialCorrelation(bad, Seq("g"), "x", "y", "z").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("1e19"))))
  }

  test("friedman/quade: duplicated-treatment block is INCOMPLETE and drops (r15 advice)") {
    // b5 has k=3 rows but treatments (t1, t1, t2) — missing t3. A
    // row-count-only completeness filter admits it and distorts the
    // within-block ranks; the distinct-treatment filter must drop it,
    // leaving the 4 clean blocks' statistics untouched.
    val clean = (1 to 4).flatMap(b => Seq(
      ("b" + b, "t1", 10L), ("b" + b, "t2", 20L), ("b" + b, "t3", 30L)))
    val dirty = clean ++ Seq(("b5", "t1", 1L), ("b5", "t1", 2L), ("b5", "t2", 3L))
    val fc = Stats.friedman(
      spark.createDataFrame(clean).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("r2_sum")).toMap
    val fd = Stats.friedman(
      spark.createDataFrame(dirty).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("r2_sum")).toMap
    assert(fc === fd)
    val qc = Stats.quade(
      spark.createDataFrame(clean).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("s4_sum")).toMap
    val qd = Stats.quade(
      spark.createDataFrame(dirty).toDF("blk", "treat", "v"), "blk", "treat", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("s4_sum")).toMap
    assert(qc === qd)
  }

  test("cramersV: perfect association gives V² = 1, independence gives 0") {
    val perfect = spark.createDataFrame(
      Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val p = Stats.cramersV(perfect, "r", "c").collect().head
    assert(p.getAs[Long]("chi2_x1000") === 20000L) // χ² = N = 20
    assert(p.getAs[Long]("v2_x1e6") === 1000000L)
    val indep = spark.createDataFrame(
      Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
        Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("r", "c")
    val i = Stats.cramersV(indep, "r", "c").collect().head
    assert(i.getAs[Long]("chi2_x1000") === 0L)
    assert(i.getAs[Long]("v2_x1e6") === 0L)
  }

  test("fleschReadability: hand-computed sentence/word/syllable counts") {
    val df = spark.createDataFrame(Seq(
      (1L, "The cat sat. The dog ran!"), (2L, ""))).toDF("doc_id", "text")
    val out = TextAnalysis.fleschReadability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getAs[Long]("n_sents") === 2L)
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Long]("n_syllables") === 6L)
    // 206835 − 1015·6/2 − 84600·6/6 = 119190 (Flesch 119.19)
    assert(r.getAs[Long]("flesch_x1000") === 119190L)
    assert(out(2L).getAs[Long]("flesch_x1000") === 0L)
  }

  test("colemanLiau: hand-computed letters/sentences, blank doc zero") {
    val df = spark.createDataFrame(Seq(
      (1L, "Go now. Be good."), (2L, ""))).toDF("doc_id", "text")
    val out = TextAnalysis.colemanLiau(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getAs[Long]("n_sents") === 2L)
    assert(r.getAs[Long]("n_words") === 4L)
    assert(r.getAs[Long]("n_letters") === 11L)
    // (5880·11) div 4 − (29600·2) div 4 − 15800 = 16170 − 14800 − 15800
    assert(r.getAs[Long]("cli_x1000") === -14430L)
    assert(out(2L).getAs[Long]("cli_x1000") === 0L)
  }

  test("lixRix: hand-computed long-word counts, blank doc zero") {
    // "Spark shuffles immense parquet files. It scales." — 7 words,
    // 2 sentences; >=7 letters: shuffles(8), immense(7), parquet(7) -> 3
    val df = spark.createDataFrame(Seq(
      (1L, "Spark shuffles immense parquet files. It scales."), (2L, "")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lixRix(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getAs[Long]("n_sents") === 2L)
    assert(r.getAs[Long]("n_words") === 7L)
    assert(r.getAs[Long]("n_long") === 3L)
    // (1000·7) div 2 + (100000·3) div 7 = 3500 + 42857 = 46357
    assert(r.getAs[Long]("lix_x1000") === 46357L)
    // (1000·3) div 2 = 1500
    assert(r.getAs[Long]("rix_x1000") === 1500L)
    assert(out(2L).getAs[Long]("lix_x1000") === 0L)
    assert(out(2L).getAs[Long]("rix_x1000") === 0L)
  }

  test("stopwordProfile: densified lexicon cells with exact ppm") {
    val df = spark.createDataFrame(Seq(
      ("s1", "the cat and the dog"), ("s1", "a bird"),
      ("s2", "no function words here"))).toDF("src", "text")
    val out = TextAnalysis.stopwordProfile(df, "text", "src",
      lexicon = Seq("the", "and", "a"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("n_tokens"), r.getAs[Long]("ppm")))
      .toMap
    // s1: 7 tokens; the=2, and=1, a=1
    assert(out(("s1", "the")) === ((2L, 7L, 2000000L / 7)))
    assert(out(("s1", "and")) === ((1L, 7L, 1000000L / 7)))
    assert(out(("s1", "a")) === ((1L, 7L, 142857L)))
    // s2 densifies to zero cells (4 tokens, no lexicon hits)
    assert(out(("s2", "the")) === ((0L, 4L, 0L)))
    assert(out.size === 6) // 2 cats x 3 lexicon words
  }

  test("partialCorrelation: y = x gives partial 1; perfect control gives NULL") {
    // y = x exactly → r_xy = 1 and the partial collapses to
    // (1 − r²)/√((1−r²)²) = 1 up to one ulp
    val df = spark.createDataFrame(Seq(
      ("g", 1L, 1L, 2L), ("g", 2L, 2L, 1L), ("g", 3L, 3L, 5L),
      ("g", 4L, 4L, 3L), ("g", 5L, 5L, 4L))).toDF("k", "x", "y", "z")
    val r = Stats.partialCorrelation(df, Seq("k"), "x", "y", "z").collect().head
    assert(r.getAs[Long]("n") === 5L)
    assert(math.abs(r.getAs[Double]("r_xy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("partial_xy_z") - 1.0) < 1e-12)
    // z = x exactly → 1 − r_xz² = 0 → NULL, never NaN/inf
    val ctrl = spark.createDataFrame(Seq(
      ("c", 1L, 5L, 1L), ("c", 2L, 3L, 2L), ("c", 3L, 4L, 3L)))
      .toDF("k", "x", "y", "z")
    val c = Stats.partialCorrelation(ctrl, Seq("k"), "x", "y", "z").collect().head
    assert(c.isNullAt(c.fieldIndex("partial_xy_z")))
  }

  test("gunningFog: complex-word counting and the floor-composed index") {
    val df = spark.createDataFrame(Seq(
      (1L, "The cat sat. The dog ran!"),      // 0 complex → 0.4·(6/2) = 1.2
      (2L, "The animalistic cat sat.")))      // 1 complex → 0.4·(4 + 25) = 11.6
      .toDF("doc_id", "text")
    val out = TextAnalysis.gunningFog(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_complex") === 0L)
    assert(out(1L).getAs[Long]("fog_x1000") === 1200L)
    assert(out(2L).getAs[Long]("n_complex") === 1L)
    assert(out(2L).getAs[Long]("fog_x1000") === 11600L)
  }

  test("yuleK: hand-computed frequency spectrum") {
    // tokens a,a,a,b → N = 4, S₂ = 10 → K = 10⁴·6/16 = 3750
    val df = spark.createDataFrame(Seq(("s", "a a a b"))).toDF("source", "text")
    val r = TextAnalysis.yuleK(df, "text", "source").collect().head
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_types") === 2L)
    assert(r.getAs[Long]("sum_f_sq") === 10L)
    assert(r.getAs[Long]("yule_k_x1000") === 3750000L)
  }

  test("jonckheere: strictly ordered groups hit the maximum; ties count once") {
    // groups 1:{1,2} 2:{3,4} 3:{5} → J = 4+2+2 = 8, J₂ = 16; E[J₂] = 8
    val df = spark.createDataFrame(Seq(
      (1, 1L), (1, 2L), (2, 3L), (2, 4L), (3, 5L))).toDF("g", "v")
    val r = Stats.jonckheere(df, "g", "v", k = 3).collect().head
    assert(r.getAs[Long]("n_total") === 5L)
    assert(r.getAs[Long]("j_x2") === 16L)
    assert(r.getAs[Long]("ej_x2") === 8L)
    assert(r.getAs[Long]("j_excess_x2") === 8L)
    // a cross-group tie contributes 1 (half a pair, doubled)
    val tied = spark.createDataFrame(Seq((1, 1L), (2, 1L))).toDF("g", "v")
    val t = Stats.jonckheere(tied, "g", "v", k = 2).collect().head
    assert(t.getAs[Long]("j_x2") === 1L)
    assert(t.getAs[Long]("j_excess_x2") === 0L)
  }

  test("madPerKey: lower medians of values and deviations") {
    // {1,2,3,10}: lower median = 2; |d| = {1,0,1,8} → MAD = 1
    val df = spark.createDataFrame(
      Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 10L))).toDF("k", "v")
    val r = Stats.madPerKey(df, Seq("k"), "v").collect().head
    assert(r.getAs[Long]("n_obs") === 4L)
    assert(r.getAs[Long]("median") === 2L)
    assert(r.getAs[Long]("mad") === 1L)
  }

  test("pageTrend: perfectly ordered blocks hit the maximum; incomplete drop") {
    // 2 complete blocks, k=3, v rising with j: L₂/block = 2+8+18 = 28
    // → L₂ = 56, E[L₂] = 2·24 = 48; a 2-row block drops
    val rows = Seq(
      ("b1", 1L, 10L), ("b1", 2L, 20L), ("b1", 3L, 30L),
      ("b2", 1L, 1L), ("b2", 2L, 2L), ("b2", 3L, 3L),
      ("b3", 1L, 5L), ("b3", 2L, 6L)).map { case (b, j, v) => ("g", b, j, v) }
    val r = Stats.pageTrend(
      spark.createDataFrame(rows).toDF("k", "blk", "j", "v"),
      Seq("k"), "blk", "j", "v", k = 3).collect().head
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(r.getAs[Long]("l2") === 56L)
    assert(r.getAs[Long]("el2") === 48L)
    assert(r.getAs[Long]("l_excess_x2") === 8L)
  }

  test("moodScaleTest: the wider sample scores above expectation") {
    // A = {1,5}, B = {3,3}, N = 4: doubled ranks (2, 5, 5, 8), scores
    // vs N+1 = 5: 1→9, 3→0, 5→9 → M·12 = 3·18 = 54 (true M = 4.5),
    // E·12 = n₁(N²−1) = 30
    val df = spark.createDataFrame(Seq(
      ("g", true, 1L), ("g", true, 5L), ("g", false, 3L), ("g", false, 3L)))
      .toDF("k", "in_a", "v")
    val r = Stats.moodScaleTest(df, Seq("k"), "in_a", "v").collect().head
    assert(r.getAs[Long]("n1") === 2L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Long]("m_x12") === 54L)
    assert(r.getAs[Long]("em_x12") === 30L)
    assert(r.getAs[Long]("m_excess_x12") === 24L)
  }

  test("trimmedSum: rank cuts drop one per side; tie runs split exactly") {
    // {1,2,3,4,100}, trim 200‰: lo = 1, hi = 4 → keep {2,3,4} = 9
    val df = spark.createDataFrame(
      Seq(1L, 2L, 3L, 4L, 100L).map(("g", _))).toDF("k", "v")
    val r = Stats.trimmedSum(df, Seq("k"), "v", trimPm = 200L).collect().head
    assert(r.getAs[Long]("n_obs") === 5L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Long]("trimmed_sum") === 9L)
    assert(r.getAs[Long]("trimmed_mean_floor") === 3L)
    // a tie run straddling the cut keeps only its in-window copies:
    // {5,5,5,5,5,9}, trim 200‰ of 6 → lo = 1, hi = 5 → keep 4×5 = 20
    val tied = spark.createDataFrame(
      (Seq.fill(5)(5L) :+ 9L).map(("t", _))).toDF("k", "v")
    val t = Stats.trimmedSum(tied, Seq("k"), "v", trimPm = 200L).collect().head
    assert(t.getAs[Long]("n_kept") === 4L)
    assert(t.getAs[Long]("trimmed_sum") === 20L)
  }

  test("moodScaleTest: all-in-A distinct values satisfy the exact identity m = E[M]") {
    // With every observation in sample A and DISTINCT values,
    // Σ(R₂−(N+1))² = N(N²−1)/3 exactly, so m_x12 = N(N²−1) = em_x12 and
    // the excess is 0 — an order-free identity that exercises the
    // DECIMAL(38,0) product/sum path (m_x12 ≈ N³) end to end. N = 3000
    // puts m_x12 at 2.7·10¹⁰, far past what a float detour would
    // render exactly.
    val n = 3000L
    val vals = new scala.util.Random(7).shuffle((1L to n).toVector)
    val df = spark.createDataFrame(vals.map(v => ("g", true, v * 31 - 4)))
      .toDF("k", "in_a", "v")
    val r = Stats.moodScaleTest(df, Seq("k"), "in_a", "v").collect().head
    assert(r.getAs[Long]("n1") === n)
    assert(r.getAs[Long]("m_x12") === n * (n * n - 1))
    assert(r.getAs[Long]("m_excess_x12") === 0L)
  }

  test("trimmedSum: a kept sum past Long.Max raises loudly, never wraps") {
    // 10 copies of 4·10¹⁸ (each fits BIGINT), trim 100‰ → lo = 1,
    // keep 8 → Σ = 3.2·10¹⁹ > Long.Max. The DECIMAL(38,0) accumulator
    // holds it exactly and the cast-down guard (loudLong — shared with
    // moodScaleTest, so this IS the boundary test for both) raises
    // instead of the old silent BIGINT wrap.
    val big = spark.createDataFrame(
      Seq.fill(10)(4000000000000000000L).map(("g", _))).toDF("k", "v")
    val e = intercept[Exception] {
      Stats.trimmedSum(big, Seq("k"), "v", trimPm = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds BIGINT")), s"got: $e")
    // just UNDER the edge: 8 × 10¹⁸ kept of 10 × 10¹⁸ = 8·10¹⁸ < Long.Max
    val under = spark.createDataFrame(
      Seq.fill(10)(1000000000000000000L).map(("g", _))).toDF("k", "v")
    val u = Stats.trimmedSum(under, Seq("k"), "v", trimPm = 100L).collect().head
    assert(u.getAs[Long]("trimmed_sum") === 8000000000000000000L)
    assert(u.getAs[Long]("trimmed_mean_floor") === 1000000000000000000L)
  }

  test("cramersVFromDenseCounts equals the generic path, including zero cells") {
    // 2x3 with one zero cell supplied densely
    val cells = spark.createDataFrame(Seq(
      ("a", 0L, 8L), ("a", 1L, 2L), ("a", 2L, 0L),
      ("b", 0L, 1L), ("b", 1L, 5L), ("b", 2L, 4L)))
      .toDF("__r", "__c", "__o")
    val dense = Stats.cramersVFromDenseCounts(cells).collect().head
    val generic = Stats.cramersVFromCounts(cells.filter("__o > 0")).collect().head
    for (c <- Seq("n_total", "n_rows", "n_cols", "chi2_x1000", "v2_x1e6"))
      assert(dense.getAs[Long](c) === generic.getAs[Long](c), c)
    // an all-zero row margin is filtered, matching observed-category
    // semantics of the generic path
    val extra = cells.union(spark.createDataFrame(Seq(
      ("z", 0L, 0L), ("z", 1L, 0L), ("z", 2L, 0L))).toDF("__r", "__c", "__o"))
    val d2 = Stats.cramersVFromDenseCounts(extra).collect().head
    assert(d2.getAs[Long]("n_rows") === 2L)
    assert(d2.getAs[Long]("chi2_x1000") === dense.getAs[Long]("chi2_x1000"))
  }

  test("kruskalWallis: three separated groups, hand-checked H") {
    // A={1,2} B={3,4} C={5,6}: H = 12/(6·7)·2·(4+0+4) = 4.571…
    val df = spark.createDataFrame(Seq(
      ("g", "A", 1L), ("g", "A", 2L), ("g", "B", 3L), ("g", "B", 4L),
      ("g", "C", 5L), ("g", "C", 6L))).toDF("k", "grp", "v")
    val r = Stats.kruskalWallis(df, Seq("k"), "grp", "v").collect().head
    assert(r.getAs[Long]("k_groups") === 3L)
    assert(r.getAs[Long]("n_obs") === 6L)
    assert(r.getAs[Long]("h_x1000") === 4571L)
    // tie run across groups: {1,1} vs {2,2} → H = 2.4 exactly
    val tied = spark.createDataFrame(Seq(
      ("t", "A", 1L), ("t", "A", 1L), ("t", "B", 2L), ("t", "B", 2L)))
      .toDF("k", "grp", "v")
    val t = Stats.kruskalWallis(tied, Seq("k"), "grp", "v").collect().head
    assert(t.getAs[Long]("h_x1000") === 2400L)
  }

  test("cliffsDelta: hand-counted dominance pairs") {
    // A={1,3} B={2,4}: p_gt=1 (3>2), p_lt=3 → δ = −0.5
    val df = spark.createDataFrame(Seq(
      ("g", true, 1L), ("g", true, 3L), ("g", false, 2L), ("g", false, 4L)))
      .toDF("k", "in_a", "v")
    val r = Stats.cliffsDelta(df, Seq("k"), "in_a", "v").collect().head
    assert(r.getAs[Long]("p_gt") === 1L)
    assert(r.getAs[Long]("p_lt") === 3L)
    assert(r.getAs[Long]("delta_pm") === -500L)
  }

  test("fleissKappa: two raters, one disagreement — kappa = −1/3") {
    val df = spark.createDataFrame(Seq(
      ("g", true, true), ("g", true, false))).toDF("k", "ra", "rb")
    val r = Stats.fleissKappa(df, Seq("k"), Seq("ra", "rb")).collect().head
    assert(r.getAs[Long]("n_subjects") === 2L)
    assert(r.getAs[Long]("s_pass") === 3L)
    assert(r.getAs[Long]("kappa_x1000") === -333L) // toward-zero truncation
    // unanimous raters: kappa degenerate (Pe = 1) → emitted 0
    val uni = spark.createDataFrame(Seq(
      ("u", true, true), ("u", true, true))).toDF("k", "ra", "rb")
    val u = Stats.fleissKappa(uni, Seq("k"), Seq("ra", "rb")).collect().head
    assert(u.getAs[Long]("kappa_x1000") === 0L)
  }

  test("cochranArmitage: perfect 0/50/100% trend gives z² = 4") {
    val df = spark.createDataFrame(Seq(
      ("g", 0L, false), ("g", 0L, false), ("g", 1L, true), ("g", 1L, false),
      ("g", 2L, true), ("g", 2L, true))).toDF("k", "w", "ok")
    val r = Stats.cochranArmitage(df, Seq("k"), "w", "ok").collect().head
    assert(r.getAs[Long]("t_num") === 12L)
    assert(r.getAs[Long]("z2_x1000") === 4000L)
    // flat rate → T = 0, z² = 0
    val flat = spark.createDataFrame(Seq(
      ("f", 0L, true), ("f", 0L, false), ("f", 1L, true), ("f", 1L, false)))
      .toDF("k", "w", "ok")
    val f = Stats.cochranArmitage(flat, Seq("k"), "w", "ok").collect().head
    assert(f.getAs[Long]("t_num") === 0L)
    assert(f.getAs[Long]("z2_x1000") === 0L)
  }

  test("ordinalAssoc: perfect diagonal and balanced 2x2") {
    val perfect = spark.createDataFrame(Seq(
      ("g", 0L, 0L, 2L), ("g", 1L, 1L, 2L))).toDF("k", "__r", "__c", "__o")
    val p = Stats.ordinalAssocFromCounts(perfect, Seq("k")).collect().head
    assert(p.getAs[Long]("c_pairs") === 4L)
    assert(p.getAs[Long]("d_pairs") === 0L)
    assert(p.getAs[Long]("gamma_pm") === 1000L)
    assert(p.getAs[Long]("somers_d_rc_pm") === 1000L)
    assert(p.getAs[Long]("tau_c_pm") === 1000L)
    val flat = spark.createDataFrame(Seq(
      ("f", 0L, 0L, 1L), ("f", 0L, 1L, 1L), ("f", 1L, 0L, 1L), ("f", 1L, 1L, 1L)))
      .toDF("k", "__r", "__c", "__o")
    val f = Stats.ordinalAssocFromCounts(flat, Seq("k")).collect().head
    assert(f.getAs[Long]("c_pairs") === 1L)
    assert(f.getAs[Long]("d_pairs") === 1L)
    assert(f.getAs[Long]("gamma_pm") === 0L)
    assert(f.getAs[Long]("tau_c_pm") === 0L)
  }

  test("winsorizedSum: clamps one rank per side to the cut values") {
    // {1,2,3,4,100}, trim 200‰ → winsorized multiset {2,2,3,4,4} = 15
    val df = spark.createDataFrame(
      Seq(1L, 2L, 3L, 4L, 100L).map(("g", _))).toDF("k", "v")
    val r = Stats.winsorizedSum(df, Seq("k"), "v", trimPm = 200L).collect().head
    assert(r.getAs[Long]("n_obs") === 5L)
    assert(r.getAs[Long]("n_clamped_side") === 1L)
    assert(r.getAs[Long]("winsorized_sum") === 15L)
    assert(r.getAs[Long]("winsorized_mean_floor") === 3L)
  }

  test("tukeyOutliers: type-7 quartiles x4 and the x8 fence census") {
    val df = spark.createDataFrame(
      Seq(1L, 2L, 3L, 4L, 100L).map(("g", _))).toDF("k", "v")
    val r = Stats.tukeyOutliers(df, Seq("k"), "v").collect().head
    assert(r.getAs[Long]("q1_x4") === 8L)   // Q1 = 2
    assert(r.getAs[Long]("q3_x4") === 16L)  // Q3 = 4
    assert(r.getAs[Long]("n_low") === 0L)
    assert(r.getAs[Long]("n_high") === 1L)  // 100 > 7
    // fractional type-7 positions: {1,2,3,4} → Q1 = 1.75, Q3 = 3.25
    val q = spark.createDataFrame(
      Seq(1L, 2L, 3L, 4L).map(("q", _))).toDF("k", "v")
    val s = Stats.tukeyOutliers(q, Seq("k"), "v").collect().head
    assert(s.getAs[Long]("q1_x4") === 7L)
    assert(s.getAs[Long]("q3_x4") === 13L)
  }

  test("summary computes type-7 quartiles (numpy default) exactly") {
    // values 1..5: q1 = 2.0, med = 3.0, q3 = 4.0 (positions land on ranks)
    val df = spark.createDataFrame((1 to 5).map(i => ("g", i.toLong, i.toDouble)))
      .toDF("k", "id", "v")
    val r = Stats.summary(df, Seq("k"), "id", "v").collect().head
    assert((r.getAs[Double]("v_min"), r.getAs[Double]("q1"), r.getAs[Double]("med"),
      r.getAs[Double]("q3"), r.getAs[Double]("v_max")) === ((1.0, 2.0, 3.0, 4.0, 5.0)))
    // values 1..4: interpolated — q1 = 1.75, med = 2.5, q3 = 3.25
    val df4 = spark.createDataFrame((1 to 4).map(i => ("g", i.toLong, i.toDouble)))
      .toDF("k", "id", "v")
    val r4 = Stats.summary(df4, Seq("k"), "id", "v").collect().head
    assert((r4.getAs[Double]("q1"), r4.getAs[Double]("med"), r4.getAs[Double]("q3"))
      === ((1.75, 2.5, 3.25)))
  }

  test("funnel counts strict-order stage progression") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)), // depth 3
      (2L, "view", ts(1)), (2L, "click", ts(2)),                          // depth 2
      (3L, "click", ts(1)), (3L, "view", ts(2)),                          // click BEFORE view -> depth 1
      (4L, "purchase", ts(1)))                                            // no view -> depth 0
    val df = spark.createDataFrame(rows).toDF("uid", "stage", "t")
    val out = Stats.funnel(df, "uid", "stage", "t", Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(3 -> 1L, 2 -> 1L, 1 -> 1L, 0 -> 1L))
  }

  test("histogram clamps out-of-range values into the edge buckets") {
    val df = spark.createDataFrame(Seq(
      ("g", -5.0), ("g", 0.0), ("g", 24.9), ("g", 25.0), ("g", 1e9)))
      .toDF("k", "v")
    val out = Stats.histogram(df, Seq("k"), "v", lo = 0.0, width = 25.0, nBuckets = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out === Map(0 -> 3L, 1 -> 1L, 2 -> 1L))
  }

  test("equidepth: bucket sizes differ by at most one; duplicate values split by the tie key") {
    // 10 rows into 4 buckets -> sizes 3,3,2,2; the five duplicate 1.0s
    // straddle buckets deterministically by id
    val df = spark.createDataFrame(
      (1 to 5).map(i => ("g", 1.0, i.toLong)) ++ (6 to 10).map(i => ("g", i.toDouble, i.toLong)))
      .toDF("k", "v", "id")
    val out = Stats.equidepthHistogram(df, Seq("k"), "v", "id", nBuckets = 4)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.values.map(_._1).toSeq.sorted == Seq(2L, 2L, 3L, 3L))
    assert(out(1) == ((3L, 1.0, 1.0)))  // ids 1-3
    assert(out(2) == ((3L, 1.0, 6.0)))  // ids 4,5 then value 6
    assert(out(4) == ((2L, 9.0, 10.0)))
  }

  test("equidepth: more buckets than rows yields one row per non-empty bucket") {
    val df = spark.createDataFrame(Seq(("g", 5.0, 1L), ("g", 3.0, 2L)))
      .toDF("k", "v", "id")
    val out = Stats.equidepthHistogram(df, Seq("k"), "v", "id", nBuckets = 8)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out == Map(1 -> 3.0, 2 -> 5.0))
  }

  test("an anti-correlated group reports corr -1; nulls are dropped") {
    val rows = Seq(("a", 1, Some(3.0)), ("a", 2, Some(2.0)), ("a", 3, Some(1.0)),
      ("a", 4, None))
    val df = spark.createDataFrame(rows.map { case (k, x, y) =>
      (k, x, y.map(Double.box).orNull) }).toDF("k", "x", "y")
    val r = Stats.regression(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("slope") === -1.0)
    assert(r.getAs[Double]("corr") === -1.0)
  }
}
