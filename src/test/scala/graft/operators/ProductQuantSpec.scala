package graft.operators

import graft.SparkSpec

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  test("pqTopK matches the hand-computed ADC ranking") {
    // 2 subspaces × 1 dim, k=2, 1 round. Subspace 0 seeds [0],[10] split
    // the corpus cleanly; subspace 1 seeds are BOTH [0] (ids 1,2), so
    // every vector ties to cid 0 there — codes: 1→[0,0], 2→[1,0],
    // 3→[0,0], 4→[1,0]
    val corpus = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(10L, 0L)),
      (3L, Seq(0L, 10L)), (4L, Seq(10L, 10L))
    ).toDF("id", "v")
    val queries = corpus.filter($"id" === 1L)
    // ADC for q=[0,0]: sub0 table {c0:0, c1:100}, sub1 table {c0:0, c1:0}
    // → id1:0, id2:100, id3:0 (its sub1 drift is hidden by the code —
    // the PQ approximation), id4:100
    val out = ProductQuant.pqTopK(corpus, queries, "id", "id", "v",
        nSub = 2, subDim = 1, kCode = 2, rounds = 1, topK = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L), (3L, 0L), (2L, 100L), (4L, 100L)))
  }

  test("pqTopK keeps exactly topK per query, ordered by (adist, id)") {
    val corpus = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(10L, 0L)),
      (3L, Seq(0L, 10L)), (4L, Seq(10L, 10L))
    ).toDF("id", "v")
    val queries = Seq((7L, Seq(0L, 0L)), (8L, Seq(10L, 10L)))
      .toDF("qid", "v") // vecCol names the vector in BOTH frames
    val out = ProductQuant.pqTopK(corpus, queries, "id", "qid", "v",
        nSub = 2, subDim = 1, kCode = 2, rounds = 1, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // q7 ≈ [0,0] → ids {1,3} (adist 0); q8 ≈ [10,10] → adist 0 for
    // {2,4} (codes [1,0], sub1 table c0 = 100? no: q8 sub1 d(c0=[0]) =
    // 100 for ALL ids — constant offsets don't change the ranking) →
    // smallest (adist, id) still picks {2,4} at 100 vs {1,3} at 200
    assert(out == Seq((7L, 1L), (7L, 3L), (8L, 2L), (8L, 4L)))
  }
}
