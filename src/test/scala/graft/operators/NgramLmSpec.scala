package graft.operators

import graft.SparkSpec

/** Bigram-LM operators: the surprise profile against a hand-computed
  * model, totality over degenerate docs, and the nucleus cut's
  * minimality/coverage laws (the kept prefix is the MINIMAL one whose
  * mass reaches p — every kept row starts under the threshold, the
  * first dropped row starts at or past it).
  */
class NgramLmSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("surpriseProfile matches a hand-computed model and keeps short docs") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: ab, ba, ab
      (2L, "a b c"),     // ab, bc
      (3L, "b a a"),     // ba, aa
      (4L, "x"),         // single token: zero bigrams, must keep a row
      (5L, "a b")        // ab
    ).toDF("doc_id", "text")
    // model: ab=4, ba=2, aa=1, bc=1; c1: a=5, b=3; V=|{b,a,c}|=3.
    // below-u test (m=1): (n12+1)*3 < c1+3.
    //   ab: 5*3=15 < 8?  no.  ba: 3*3=9 < 6? no.  aa: 2*3=6 < 8? yes.
    //   bc: 2*3=6 < 6? no.
    val out = NgramLm.surpriseProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, false),
      (2L, 2L, 0L, false),
      (3L, 2L, 1L, true),  // aa is the sole below-uniform bigram; 2*1 >= 2
      (4L, 0L, 0L, true),  // zero-bigram doc: 0 >= 0
      (5L, 1L, 0L, false)))
  }

  test("dsirSelect matches a hand-computed ratio test and drops targets") {
    val docs = Seq(
      (1L, "a b a b", "tgt"), // target: ab x2, ba x1; n1_t: a=2, b=1; V_t = 2
      (2L, "a b", "cand"),    // corpus: ab x1, cc x1; n1_c: a=1, c=1; V_c = 2
      (3L, "c c", "cand")
    ).toDF("doc_id", "text", "src")
    val out = NgramLm.dsirSelect(docs, "doc_id", "text",
      org.apache.spark.sql.functions.col("src") === "tgt")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // ab: (2+1)(1+2)=9 >= (1+1)(2+2)=8 -> favored
    // cc: (0+1)(1+2)=3 >= (1+1)(0+2)=4 -> not favored
    assert(out.toSeq == Seq((2L, 1L, 1L, true), (3L, 1L, 0L, false)))
  }

  test("nucleus: kept prefix is minimal and covering for every context") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = NgramLm.nucleus(docs, "doc_id", "text", minCount = 20L)
    val rows = cut.collect()
    assert(rows.nonEmpty)
    // structural law: every row covered_ok, and the cut is minimal —
    // cov_cut minus the last kept successor's mass must be UNDER p.
    assert(rows.forall(_.getAs[Boolean]("covered_ok")))
    assert(rows.forall(r => r.getAs[Long]("nucleus_size") >= 1L))
    assert(rows.forall(r =>
      r.getAs[Long]("nucleus_size") <= r.getAs[Long]("n_succ")))
  }

  test("kneserNey: the continuation correction demotes the one-context bigram") {
    // 'y' is frequent but ONLY follows 'x' (the Francisco effect);
    // 'c' follows both 'a' and 'b'. Corpus bigrams:
    //   x y (x3), a c, b c, c x  -> B = 4 distinct bigram types
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x y"),
      (4L, "a c"), (5L, "b c"), (6L, "c x")).toDF("doc_id", "text")
    val out = NgramLm.kneserNey(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = out(("x", "y"))
    // c12=3, c1=3, nf1=1, nb2(y)=1, B=4:
    // pkn = ((4*3-3)*4 + 3*1*1)*1e6 / (4*3*4) = (36+3)/48 = 812500
    assert(xy.getAs[Long]("pkn_x1e6") === 812500L)
    assert(xy.getAs[Long]("pmle_x1e6") === 1000000L)
    // the KN correction took ~19% off the MLE for the one-context pair
    val ac = out(("a", "c"))
    // c12=1, c1=1, nf1=1, nb2(c)=2, B=4: ((1)*4 + 3*1*2)/(4*1*4) = 10/16
    assert(ac.getAs[Long]("pkn_x1e6") === 625000L)
    assert(ac.getAs[Long]("pmle_x1e6") === 1000000L)
    // c follows two contexts -> its continuation mass beats y's
    assert(ac.getAs[Long]("nb2") === 2L)
    assert(xy.getAs[Long]("nb2") === 1L)
  }
}
