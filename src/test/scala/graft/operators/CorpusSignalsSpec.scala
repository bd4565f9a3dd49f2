package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** χ² token association, token burstiness, hapax n-gram rate, and the
  * binary-sign ANN — the round-13 corpus-signal additions.
  */
class CorpusSignalsSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(rows).toDF("doc_id", "text", "cat")

  test("chi2TokenAssoc: perfectly separating token maxes out, shared token is 0") {
    // 'x' appears in ALL of cat a and NONE of cat b; 'z' appears in all
    // docs of both. 2×2 for (a, x): a=3 b=0 c=0 d=3 → chi2 = N = 6.
    val df = docs(Seq(
      (1L, "x z", "a"), (2L, "x z", "a"), (3L, "x z", "a"),
      (4L, "y z", "b"), (5L, "y z", "b"), (6L, "y z", "b")))
    val out = TextAnalysis.chi2TokenAssoc(df, "doc_id", "text", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("a", "x")).getAs[Long]("chi2_x1000") === 6000L)
    // a = 0 pairs are not emitted (sparse table — same contract as the
    // oracle's occurring-pairs join): (b, x) never appears.
    assert(!out.contains(("b", "x")))
    assert(out(("b", "y")).getAs[Long]("chi2_x1000") === 6000L) // symmetric 2x2
    // token in every doc → zero denominator → defined-as-zero emission
    assert(out(("a", "z")).getAs[Long]("chi2_x1000") === 0L)
    assert(out(("a", "x")).getAs[Long]("df_cat") === 3L)
    assert(out(("a", "x")).getAs[Long]("df_tot") === 3L)
  }

  test("chi2TokenAssoc counts document frequency, not term frequency") {
    // token repeated within one doc must count once
    val df = docs(Seq((1L, "w w w", "a"), (2L, "v", "b")))
    val out = TextAnalysis.chi2TokenAssoc(df, "doc_id", "text", "cat")
      .filter(col("tok") === "w").collect().head
    assert(out.getAs[Long]("df_tot") === 1L)
  }

  test("tokenBurstiness: cf/df per-mille with the df floor") {
    // 'b' occurs 6 times across 2 docs → 3000; 'f' flat 1-per-doc → 1000;
    // 'r' df=1 < minDf → filtered out.
    val df = docs(Seq(
      (1L, "b b b f r", "x"), (2L, "b b b f", "x"),
      (3L, "f", "x"), (4L, "f", "x")))
    val out = TextAnalysis.tokenBurstiness(df, "doc_id", "text", minDf = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("r"))
    assert(out("b").getAs[Long]("cf") === 6L)
    assert(out("b").getAs[Long]("df") === 2L)
    assert(out("b").getAs[Long]("burst_x1000") === 3000L)
    assert(out("f").getAs[Long]("burst_x1000") === 1000L)
  }

  test("chao1: spectrum counts and the bias-corrected estimate") {
    // cat a: tokens u u v w → f(u)=2, f(v)=1, f(w)=1 → S=3, f1=2, f2=1,
    // N=4; chao1_x10 = 30 + (10·2·1) div (2·2) = 35; coverage = 1000 −
    // (1000·2) div 4 = 500.
    val df = docs(Seq((1L, "u u v", "a"), (2L, "w", "a"),
      (3L, "q q", "b"))) // cat b: f1=0 → chao1 = S exactly, coverage 1000
    val out = TextAnalysis.chao1(df, "text", "cat")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_types") === 3L)
    assert(out("a").getAs[Long]("f1") === 2L)
    assert(out("a").getAs[Long]("f2") === 1L)
    assert(out("a").getAs[Long]("chao1_x10") === 35L)
    assert(out("a").getAs[Long]("coverage_pm") === 500L)
    assert(out("b").getAs[Long]("chao1_x10") === 10L)
    assert(out("b").getAs[Long]("coverage_pm") === 1000L)
  }

  test("griesDp: uniform term scores 0, concentrated term scores the complement mass") {
    // parts a (4 tokens) and b (4 tokens). 'z' appears 2+2 → shares
    // match sizes exactly → DP = 0. 'k' appears only in a (2 copies):
    // DP = (|2/4 − 4/8·...|)… cross-mult: Σ|c·N − n_p·C| = |2·8−4·2| +
    // |0·8−4·2| = 8+8 = 16 → dp_pm = 16000 div (2·2·8) = 500.
    val df = docs(Seq(
      (1L, "z z k k", "a"), (2L, "z z w w", "b")))
    val out = TextAnalysis.griesDp(df, "text", "cat", topK = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("z").getAs[Long]("dp_pm") === 0L)
    assert(out("k").getAs[Long]("dp_pm") === 500L)
    // top-3 of 3 terms: deterministic (cf desc, term asc) keeps z first
    assert(out.keySet === Set("z", "k", "w"))
  }

  test("qlmDirichletTopK: term mass beats length; no-term docs are excluded") {
    val df = docs(Seq(
      (1L, "q q q pad", "x"),         // tf=3, dl=4
      (2L, "q pad pad pad", "x"),     // tf=1, dl=4 -> below doc 1
      (3L, "pad pad pad pad", "x")))  // no term -> excluded
    val out = graft.operators.Retrieval
      .qlmDirichletTopK(df, "doc_id", "text", Seq("q"), mu = 10L, topK = 5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    // hand check doc 1's score: (3*12 + 10*4)/((4+10)*12) = 76/168
    assert(math.abs(out.head.getAs[Double]("qlm_score") - 76.0 / 168.0) < 1e-12)
  }

  test("hapaxNgramRate: repeated trigram is not hapax, unique ones are") {
    // key k1: 'a b c a b c' → grams: abc, bca, cab, abc → distinct 3,
    // hapax 2 (bca, cab) → 666 per-mille.
    val df = docs(Seq((1L, "a b c a b c", "k1"), (2L, "p q r s", "k2")))
    val out = TextAnalysis.hapaxNgramRate(df, "cat", "text", n = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k1").getAs[Long]("n_grams") === 3L)
    assert(out("k1").getAs[Long]("n_hapax") === 2L)
    assert(out("k1").getAs[Long]("hapax_pm") === 666L)
    assert(out("k2").getAs[Long]("hapax_pm") === 1000L)
  }

  test("signBitTopK: identical vector is Hamming-0 and cosine-1 rank 1") {
    val dim = 64
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => (((i * 2654435761L + seed * 40503L) % 1000) - 500).toFloat / 500f)
    val corpus = spark.createDataFrame(
      (10L to 40L).map(id => (id, vec(id.toInt)))).toDF("id", "v")
    val queries = spark.createDataFrame(
      Seq((1L, vec(25)), (2L, vec(33)))).toDF("id", "v")
    val out = Similarity.signBitTopK(corpus, queries, "id", "v", "id",
      k = 3, prefilterK = 10).collect()
    val top = out.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(top(1L).getAs[Long]("neighbor_id") === 25L)
    assert(top(1L).getAs[Long]("hamming") === 0L)
    assert(top(1L).getAs[Double]("cosine") === 1.0)
    assert(top(2L).getAs[Long]("neighbor_id") === 33L)
    // every query returns exactly k ranked rows, ranks 1..k
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("signBitTopK prefilter agrees with brute force when prefilter covers corpus") {
    val dim = 64
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => (((i * 7919L + seed * 104729L) % 997) - 498).toFloat / 498f)
    val corpus = spark.createDataFrame(
      (10L to 25L).map(id => (id, vec(id.toInt)))).toDF("id", "v")
    val queries = spark.createDataFrame(Seq((1L, vec(7)))).toDF("id", "v")
    // prefilterK = |corpus| → the rerank sees everything → exact = brute
    val approx = Similarity.signBitTopK(corpus, queries, "id", "v", "id",
      k = 5, prefilterK = 16)
      .select("query_id", "neighbor_id", "cosine", "rank").collect().toSeq
    val brute = Similarity.bruteForceTopK(corpus, queries, "id", "v", "id", k = 5)
      .select("query_id", "neighbor_id", "cosine", "rank").collect().toSeq
    assert(approx.map(_.toSeq).sortBy(_.toString) ===
      brute.map(_.toSeq).sortBy(_.toString))
  }
}
