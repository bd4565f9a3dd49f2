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

  test("queryPqIndex serves bit-identically to the ad-hoc pqTopK") {
    val corpus = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(10L, 0L)),
      (3L, Seq(0L, 10L)), (4L, Seq(10L, 10L))
    ).toDF("id", "v")
    val queries = Seq((7L, Seq(0L, 0L)), (8L, Seq(10L, 10L))).toDF("qid", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("pq_index_spec").toString
    ProductQuant.writePqIndex(corpus, "id", "v", dir,
      nSub = 2, subDim = 1, kCode = 2, rounds = 1)
    val indexed = ProductQuant.queryPqIndex(spark, dir, queries, "qid", "v",
        nSub = 2, subDim = 1, kCode = 2, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val adhoc = ProductQuant.pqTopK(corpus, queries, "id", "qid", "v",
        nSub = 2, subDim = 1, kCode = 2, rounds = 1, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == adhoc)
    assert(indexed.nonEmpty)
  }

  test("ivfpqTopK: probed-cell results carry the full-PQ adist exactly") {
    // raw doubles drive the IVF cells; the int vectors drive PQ. With
    // nProbe = nCentroids the hybrid must EQUAL the full scan.
    val corpus = Seq(
      (1L, Seq(0.0, 0.0), Seq(0L, 0L)), (2L, Seq(10.0, 0.0), Seq(10L, 0L)),
      (3L, Seq(0.0, 10.0), Seq(0L, 10L)), (4L, Seq(10.0, 10.0), Seq(10L, 10L))
    ).toDF("id", "rv", "v")
    val queries = Seq((7L, Seq(0.1, 0.1), Seq(0L, 0L))).toDF("qid", "rv", "v")
    val all = ProductQuant.ivfpqTopK(corpus, queries, "id", "qid", "rv", "v",
        k = 4, nCentroids = 2, nProbe = 2,
        nSub = 2, subDim = 1, kCode = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = ProductQuant.pqTopK(corpus, queries, "id", "qid", "v",
        nSub = 2, subDim = 1, kCode = 2, rounds = 1, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == full)
    // pruned: nProbe = 1 returns a SUBSET whose adists still match full
    val pruned = ProductQuant.ivfpqTopK(corpus, queries, "id", "qid", "rv", "v",
        k = 4, nCentroids = 2, nProbe = 1,
        nSub = 2, subDim = 1, kCode = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned.nonEmpty && pruned.subsetOf(full),
      s"pruned=$pruned full=$full")
  }

  test("encodeWithCodebooks reproduces trainEncode's final assignment exactly") {
    // the append-path contract: identical vectors re-encoded against
    // the FROZEN codebooks must land on identical codes — lloydRounds
    // assigns its last round against the centroids it returns, and both
    // paths tie-break min(struct(dist, cid))
    val corpus = (1L to 24L)
      .map(i => (i, Seq(i % 7, (i * 3) % 11, i % 5, (i * 5) % 13)))
      .toDF("id", "v")
    val (codes, cents) = ProductQuant.trainEncode(
      corpus, "id", "v", nSub = 2, subDim = 2, kCode = 3, rounds = 2)
    val want = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val got = ProductQuant.encodeWithCodebooks(
        corpus.select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("v")), cents, nSub = 2, subDim = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got === want)
    // and a NEW vector encodes deterministically (same call, same result)
    val fresh = Seq((99L, Seq(3L, 4L, 2L, 6L))).toDF("id", "v")
    val e1 = ProductQuant.encodeWithCodebooks(fresh, cents, 2, 2)
      .collect().head.getSeq[Long](1).toSeq
    val e2 = ProductQuant.encodeWithCodebooks(fresh, cents, 2, 2)
      .collect().head.getSeq[Long](1).toSeq
    assert(e1 === e2 && e1.size === 2)
  }
}
