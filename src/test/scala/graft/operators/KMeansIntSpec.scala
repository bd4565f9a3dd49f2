package graft.operators

import graft.SparkSpec

class KMeansIntSpec extends SparkSpec {
  import spark.implicits._

  test("lloydRounds matches the hand-computed 1-D iteration") {
    // ids 1..4 at [0],[2],[10],[12]; seeds = two smallest ids → [0],[2]
    val df = Seq(
      (1L, Seq(0L)), (2L, Seq(2L)), (3L, Seq(10L)), (4L, Seq(12L))
    ).toDF("id", "v")
    // round 1: assign {1}→c0, {2,3,4}→c1; update c0=[0], c1=[floor(24/3)]=[8]
    // round 2: 1→c0 d0, 2→c0 d4 (4<36), 3→c1 d4, 4→c1 d16
    val out = KMeansInt.lloydRounds(df, "id", "v", k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 4L), (3L, 1L, 4L), (4L, 1L, 16L)))
  }

  test("argmin ties break to the smallest centroid id") {
    // [1] sits exactly between seeds [0] and [2]
    val df = Seq((1L, Seq(0L)), (2L, Seq(2L)), (3L, Seq(1L))).toDF("id", "v")
    val out = KMeansInt.lloydRounds(df, "id", "v", k = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(3L) == 0L)
  }

  test("a single round scores against the seed centroids only") {
    val df = Seq((1L, Seq(0L, 0L)), (2L, Seq(3L, 4L)), (3L, Seq(1L, 1L)))
      .toDF("id", "v")
    val out = KMeansInt.lloydRounds(df, "id", "v", k = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(3L) == ((0L, 2L))) // d(seed1)=2 < d(seed2)=13
  }

  test("lloydRounds leaves no checkpoint pins behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = Seq((1L, Seq(0L)), (2L, Seq(2L)), (3L, Seq(10L))).toDF("id", "v")
    KMeansInt.lloydRounds(df, "id", "v", k = 2, rounds = 2).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"pins leaked: $before -> $after")
  }
}
