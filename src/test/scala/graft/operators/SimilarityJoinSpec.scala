package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked pairs at t = 1/2") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")), // ∩=3 ∪=5 → 0.6 ≥ 0.5 ✓
      (3L, Seq("a", "x", "y", "z")), // vs 1: ∩=1 ∪=7 → no
      (4L, Seq("a", "b", "c", "d"))  // identical to 1 → 1.0 ✓
    ).toDF("id", "els")
    val out = SimilarityJoin.jaccardJoin(docs, "id", "els", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out((1L, 2L)) == ((3L, 5L)))
    assert(out((1L, 4L)) == ((4L, 4L)))
  }

  test("lossless vs the naive quadratic join on the real corpus") {
    val tk = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.expressions.functions.ascii_tokens(col("text")).as("tk"))
      .select(col("doc_id"), graft.expressions.functions.word_bigrams(col("tk")).as("bgs"))
      .filter(size(col("bgs")) >= 1)
    val fast = SimilarityJoin.jaccardJoin(tk, "doc_id", "bgs", 3, 10)
      .select("id_a", "id_b", "n_inter", "n_union")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // naive truth: explode distinct elements, self-join, count
    val els = tk.select(col("doc_id"), explode(array_distinct(col("bgs"))).as("el"))
    val sz = els.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val naive = els.select(col("doc_id").as("id_a"), col("el"))
      .join(els.select(col("doc_id").as("id_b"), col("el")), Seq("el"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"))
      .filter(col("n_inter") * 10 >= col("n_union") * 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fast == naive, s"prefix filter lost or invented pairs: " +
      s"missing=${naive -- fast}, extra=${fast -- naive}")
    assert(naive.nonEmpty, "vacuous: no qualifying pairs in the fixture")
  }

  test("the prefix genuinely prunes: candidate elements < all elements") {
    // at t=9/10 the prefix is |x| - ceil(0.9|x|) + 1 = 3 of each 20-set
    val docs = Seq(
      (1L, (1 to 20).map(i => s"e$i")),
      (2L, (1 to 20).map(i => s"e$i")),
      (3L, (30 to 49).map(i => s"e$i"))
    ).toDF("id", "els")
    val out = SimilarityJoin.jaccardJoin(docs, "id", "els", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
    // the scaling property itself: the candidate stream carries each
    // set's 3-element prefix, not its 20 elements
    val nPrefix = SimilarityJoin.prefixes(docs, "id", "els", 9, 10).count()
    assert(nPrefix == 9L, s"expected 3 prefix elements per set, got $nPrefix total")
  }

  test("sub-threshold and disjoint sets never pair") {
    val docs = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("c", "d")),
      (3L, Seq("a", "c", "d", "e", "f", "g"))
    ).toDF("id", "els")
    assert(SimilarityJoin.jaccardJoin(docs, "id", "els", 1, 2).count() == 0)
  }
}
