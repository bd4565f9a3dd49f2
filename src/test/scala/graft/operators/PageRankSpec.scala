package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L
  private val T = 150000000000L // (S*15) div 100

  test("2-cycle is the exact fixed point: scores never move off S") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.integerPageRank(edges, "src", "dst", iters = 4, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each node receives the other's full mass: T + (S*85) div 100 = S
    assert(out == Map(1L -> S, 2L -> S))
  }

  test("star: hub absorbs spoke mass round 1, settles to the spoke-teleport level") {
    // spokes 1,2,3 -> hub 9; hub has no out-edges (its mass evaporates)
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val r1 = PageRank.integerPageRank(edges, "src", "dst", iters = 1, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(9L) == T + (3 * S * 85L) / 100L) // 2.7e12
    assert(r1(1L) == T && r1(2L) == T && r1(3L) == T)
    val r2 = PageRank.integerPageRank(edges, "src", "dst", iters = 2, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2: spokes hold at T, hub gets 85% of 3T
    assert(r2(9L) == T + (3 * T * 85L) / 100L)
    assert(r2(1L) == T)
  }

  test("out-degree splits mass with floor division, per-edge") {
    // 1 -> {2, 3}: each successor gets (S div 2), then the damping cut
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val out = PageRank.integerPageRank(edges, "src", "dst", iters = 1, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == T + ((S / 2) * 85L) / 100L)
    assert(out(2L) == out(3L))
    assert(out(1L) == T)
  }

  test("personalized: teleport and init land only on seeds (2-cycle hand check)") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r2 = PageRank.personalizedPageRank(edges, "src", "dst", seeds, "id",
        iters = 2, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s0: 1 -> S, 2 -> 0
    // r1: node1 = T + 85% of node2's 0 = T; node2 = 0 + 85% of S
    // r2: node1 = T + 85% of (85% of S); node2 = 0 + 85% of T
    val d85 = (x: Long) => (x * 85L) / 100L
    assert(r2 == Map(1L -> (T + d85(d85(S))), 2L -> d85(T)))
  }

  test("personalized: non-seed no-in-edge nodes sit at hard 0, seed ones at T") {
    // spokes 1,2,3 -> hub 9; only spoke 1 is a seed
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r1 = PageRank.personalizedPageRank(edges, "src", "dst", seeds, "id",
        iters = 1, scale = S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) == T && r1(2L) == 0L && r1(3L) == 0L)
    // hub receives only the seed spoke's initial mass
    assert(r1(9L) == (S * 85L) / 100L)
  }

  test("weighted: mass splits by edge weight, not uniformly") {
    // 1→2 w=3, 1→3 w=1 at S=1000, teleport 150, W₁=4:
    // r1: msgs 750/250 → scores 2:787, 3:362 (1 floors at 150)
    // r2: from score 150 → msgs 112/37 → 2:245, 3:181
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r1 = PageRank.weightedPageRank(edges, "src", "dst", "w",
        iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 150L, 2L -> 787L, 3L -> 362L))
    val r2 = PageRank.weightedPageRank(edges, "src", "dst", "w",
        iters = 2, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 150L, 2L -> 245L, 3L -> 181L))
    // equal weights reduce to the unweighted rank
    val ew = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L)).toDF("src", "dst", "w")
    val uw = ew.select($"src", $"dst")
    val a = PageRank.weightedPageRank(ew, "src", "dst", "w", iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.integerPageRank(uw, "src", "dst", iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("iteration plans stay flat: the loop checkpoints each round") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val df = PageRank.integerPageRank(edges, "src", "dst", iters = 5, scale = S)
    df.collect()
    // each round checkpoints, so the FINAL plan is one flat scan of the
    // materialized round-5 scores — a non-checkpointed loop would nest
    // 5 rounds of joins+aggregates here (thousands of chars, joins in
    // the final plan) regardless of join strategy
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"final plan re-runs the iteration:\n$plan")
    assert(plan.length < 2000, s"lineage not truncated (plan is ${plan.length} chars)")
  }
}
