package graft.operators

import graft.SparkSpec

class SetCoverSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked greedy: biggest first, then best marginal gain") {
    // doc 1 = {a,b,c,d}, doc 2 = {c,d,e}, doc 3 = {e,f}
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "c"), (2L, "d"), (2L, "e"),
      (3L, "e"), (3L, "f")).toDF("id", "elem")
    val picks = SetCover.greedyMaxCoverage(df, "id", "elem", k = 3)
    // round 1: doc 1 (gain 4); round 2: doc 3 (gain 2 = {e,f} beats
    // doc 2's marginal {e} = 1); round 3: doc 2 covers nothing new ->
    // anti-join leaves no rows for it, greedy exhausts at 2 picks
    assert(picks == Seq((1, 1L, 4L), (2, 3L, 2L)))
  }

  test("gain ties break toward the smallest id") {
    val df = Seq((5L, "x"), (5L, "y"), (2L, "p"), (2L, "q"), (9L, "z"))
      .toDF("id", "elem")
    val picks = SetCover.greedyMaxCoverage(df, "id", "elem", k = 2)
    // 2 and 5 both gain 2 in round 1: smallest id (2) must win
    assert(picks.head == ((1, 2L, 2L)))
    assert(picks(1) == ((2, 5L, 2L)))
  }

  test("duplicate incidence pairs do not inflate gains") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (2L, "c"))
      .toDF("id", "elem")
    val picks = SetCover.greedyMaxCoverage(df, "id", "elem", k = 1)
    // doc 1's triplicated 'a' counts once: doc 2 (gain 2) wins
    assert(picks == Seq((1, 2L, 2L)))
  }
}
