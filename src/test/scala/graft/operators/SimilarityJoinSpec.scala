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

  test("tfCosineJoin: hand-checked integer witnesses") {
    val docs = Seq(
      (1L, Seq("a", "a", "b")),      // tf {a:2, b:1}, ‖·‖² = 5
      (2L, Seq("a", "b", "b")),      // cos vs 1 = 4/5 = 0.8
      (3L, Seq("a", "a", "b", "b")), // cos vs 1 = 6/sqrt(5·8) ≈ 0.949
      (4L, Seq("x", "y"))            // disjoint from all
    ).toDF("id", "toks")
    val at45 = SimilarityJoin.tfCosineJoin(docs, "id", "toks", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 0.8 makes the >= 4/5 cut exactly (25·16 >= 16·25); 0.949 clears it
    assert(at45.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(at45((1L, 2L)) == ((4L, 5L, 5L)))
    assert(at45((1L, 3L)) == ((6L, 5L, 8L)))
    val at9 = SimilarityJoin.tfCosineJoin(docs, "id", "toks", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the two ≈0.949 pairs survive 0.9 ((2,3) mirrors (1,3)); 0.8 doesn't
    assert(at9 == Set((1L, 3L), (2L, 3L)))
  }

  test("tfCosineJoin: maxDf redefines the vector space, exactly") {
    val docs = Seq(
      (1L, Seq("stop", "rare1")),
      (2L, Seq("stop", "rare1")),
      (3L, Seq("stop", "rare2"))
    ).toDF("id", "toks")
    // "stop" has df 3: with maxDf = 2 it vanishes from dots AND norms,
    // so 1-2 stay identical (cos 1) and 1-3/2-3 share nothing
    val out = SimilarityJoin.tfCosineJoin(docs, "id", "toks", 9, 10, maxDf = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == ((1L, 1L, 1L)))
    // without the cut, all three pair at cos = 1/2... none ≥ 0.9, but
    // 1-2 at cos 1 still qualifies with the stopword counted
    val full = SimilarityJoin.tfCosineJoin(docs, "id", "toks", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(full.keySet == Set((1L, 2L)) && full((1L, 2L)) == 2L)
  }

  test("tfCosineJoin matches the naive quadratic cosine on the real corpus") {
    val tk = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.expressions.functions.ascii_tokens(col("text")).as("toks"))
    val fast = SimilarityJoin.tfCosineJoin(tk, "doc_id", "toks", 17, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tf = tk.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val n2 = tf.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val naive = tf.select(col("doc_id").as("id_a"), col("t"), col("tf").as("fa"))
      .join(tf.select(col("doc_id").as("id_b"), col("t"), col("tf").as("fb")), Seq("t"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("fa") * col("fb")).as("dot"))
      .join(n2.select(col("doc_id").as("id_a"), col("n2").as("na2")), Seq("id_a"))
      .join(n2.select(col("doc_id").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
      .filter(lit(400L) * col("dot") * col("dot") >= lit(289L) * col("na2") * col("nb2"))
      // using-column joins move the key first: re-select the pair order
      .select("id_a", "id_b", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == naive,
      s"missing=${naive -- fast}, extra=${fast -- naive}")
    assert(naive.nonEmpty, "vacuous: no qualifying pairs in the fixture")
  }

  test("containmentJoin flags the asymmetric subset direction") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),                     // ⊂ 2: containment 1.0
      (2L, Seq("a", "b", "c", "d", "e", "f")),      // reverse: 3/6 < 9/10
      (3L, Seq("z")),                               // disjoint: absent
      (4L, Seq("a", "b", "c"))                      // = 1: both directions
    ).toDF("id", "els")
    val out = SimilarityJoin.containmentJoin(docs, "id", "els", 9, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out((1L, 2L)) == ((3L, true, false)))  // 1 in 2, not 2 in 1
    assert(out((1L, 4L)) == ((3L, true, true)))   // exact duplicates
    assert(out((2L, 4L)) == ((3L, false, true)))  // 4 in 2
  }

  test("containmentJoin is set-semantic: repeated elements count once") {
    val docs = Seq(
      (1L, Seq("a", "a", "a", "b")),  // set {a,b}
      (2L, Seq("a", "b", "b"))        // set {a,b} → identical sets
    ).toDF("id", "els")
    val out = SimilarityJoin.containmentJoin(docs, "id", "els", 1, 1)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((2L, 2L, 2L)))
  }
}
