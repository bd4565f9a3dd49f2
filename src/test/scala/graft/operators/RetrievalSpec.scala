package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark table scan"),           // tf(table)=1, dl=3
    (2L, "table table table join"),     // tf(table)=3, dl=4
    (3L, "hash join probe build"),      // no 'table'
    (4L, "table"),                      // tf=1, dl=1 — shortest doc
    (5L, "row group filter predicate")) // no match at all
    .toDF("doc_id", "text")

  test("bm25 ranks by the textbook formula (hand-computed)") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("table"), topK = 10)
      .select("doc_id", "dl", "tf_table", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // N=5, df=3, avgdl=(3+4+4+1+4)/5=3.2, idf=ln(1+(5-3+0.5)/(3.5))
    val n = 5.0; val df = 3.0; val avgdl = 3.2
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def score(tf: Double, dl: Double): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected = Seq((1L, 3L, 1L), (2L, 4L, 3L), (4L, 1L, 1L))
      .map { case (id, dl, tf) => (id, dl, tf, score(tf.toDouble, dl.toDouble)) }
      .sortBy { case (id, _, _, s) => (-s, id) }
      .zipWithIndex.map { case ((id, dl, tf, _), i) => (id, dl, tf, i + 1) }
    assert(out.sortBy(_._4).toSeq == expected)
    // sanity on the shape itself: doc 4 (tf=1, shortest) outranks doc 1
    // (tf=1, longer), and high-tf doc 2 is penalized by its length but not
    // below the tf=1 docs
    assert(out.find(_._1 == 4L).get._4 < out.find(_._1 == 1L).get._4)
  }

  test("length normalization outweighs raw tf: short tf=1 doc beats long tf=2 doc") {
    // score(tf=1, dl=1) ≈ 1.588·idf vs score(tf=2, dl=20) ≈ 1.096·idf at
    // avgdl=10.5 — a scorer that dropped the dl/avgdl normalization would
    // rank these the other way, so this ordering is normalization-sensitive
    val corpus = Seq(
      (1L, "term"),
      (2L, "term term x x x x x x x x x x x x x x x x x x"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("term"), topK = 2)
      .select("doc_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 1, 2L -> 2))
  }

  test("docs matching no query term are excluded") {
    val ids = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("table"), topK = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }

  test("mathematical ties break by doc id in rank order") {
    val tied = Seq((7L, "alpha beta"), (3L, "alpha beta"), (5L, "gamma delta"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(tied, "doc_id", "text", Seq("alpha"), topK = 10)
      .select("doc_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    assert(out.toSeq == Seq((3L, 1), (7L, 2)))
  }

  test("corpus is aggregated once and never shuffled: one-row stats broadcast back") {
    val df = Retrieval.bm25TopK(
      graft.Tables.documents(spark, sf), "doc_id", "text", Seq("table", "hash"), topK = 5)
    val plan = df.queryExecution.executedPlan.toString
    // the only join is the broadcast of the single stats row; the corpus
    // itself must not hash-exchange (TakeOrdered handles the top-k)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast stats join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle for bm25:\n$plan")
  }

  test("rrfFuse blends two rankings: overlap wins, single-list ids coalesce to 0") {
    // id 10 is rank 2 in both lists: 2/62 > 1/61 (the two solo rank-1s),
    // so full RRF order is 10, then 20 (lex#1), 30 (sem#1) tied by score
    // and broken by id, then the tails.
    val lex = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val sem = Seq((30L, 1), (10L, 2), (50L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "id", kConst = 60, topK = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (10L, 2L, 2L, 1),
      (20L, 1L, 0L, 2), // 1/61 ties 30's 1/61; id breaks it
      (30L, 0L, 1L, 3),
      (40L, 3L, 0L, 4), // 1/63 ties 50's; id again
      (50L, 0L, 3L, 5)))
  }

  test("rrfFuse scores a duplicated id once, by its best rank in the list") {
    // id 10 appears at ranks 1 and 3 in lex (an undeduped multi-query
    // top-k): it must contribute 1/61 once, not 1/61 + 1/63
    val lex = Seq((10L, 1), (20L, 2), (10L, 3)).toDF("id", "rank")
    val sem = Seq((20L, 1)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "id", 60, topK = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // 20 blends 1/62 + 1/61 > 10's single 1/61
    assert(out.toSeq == Seq((20L, 2L, 1L, 1), (10L, 1L, 0L, 2)))
  }

  test("rrfFuse topK truncates after fusion, not before") {
    val lex = (1L to 8L).map(i => (i, i.toInt)).toDF("id", "rank")
    val sem = Seq((8L, 1)).toDF("id", "rank") // last lex id is sem's best
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "id", 60, topK = 3)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    // 8 carries 1/68 + 1/61 — the largest blend — despite being lex's worst
    assert(out.head == (8L, 1))
    assert(out.length == 3)
  }

  test("mmrRerank: diversity demotes the near-duplicate (hand-traced)") {
    // rel: A(1)=900k, B(2)=880k, C(3)=870k; sim(A,B)=990k (near-dup),
    // sim(A,C)=100k, sim(B,C)=120k, lambda=700:
    //   round 1 -> A (max rel)
    //   round 2: B: 700*880k - 300*990k = 319.0M; C: 700*870k - 300*100k
    //            = 579.0M -> C wins despite lower rel
    //   round 3 -> B
    val cands = Seq((9L, 1L, 900000L), (9L, 2L, 880000L), (9L, 3L, 870000L))
      .toDF("query_id", "id", "rel")
    val sims = Seq(
      (9L, 1L, 2L, 990000L), (9L, 2L, 1L, 990000L),
      (9L, 1L, 3L, 100000L), (9L, 3L, 1L, 100000L),
      (9L, 2L, 3L, 120000L), (9L, 3L, 2L, 120000L))
      .toDF("query_id", "id_a", "id_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, k = 3, lambdaPm = 700L)
      .orderBy("sel_rank").collect()
      .map(r => (r.getAs[Long]("sel_rank"), r.getAs[Long]("id")))
    assert(got.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("mmrRerank aggregate replays the join-loop greedy chain exactly (multi-query)") {
    // 3 queries × 5 candidates with deterministic pseudo-random rel/sim:
    // two independent implementations of one greedy chain must agree row
    // for row (the r16 re-shape's checksum-equality certificate)
    def h(x: Long): Long = {
      var z = x * 2654435761L
      z ^= z >>> 13
      math.abs(z % 1000000L)
    }
    val cands = for (q <- 1L to 3L; i <- 1L to 5L)
      yield (q, i, h(q * 31 + i))
    val sims = for (q <- 1L to 3L; a <- 1L to 5L; b <- 1L to 5L if a != b)
      yield (q, a, b, h(q * 131 + math.min(a, b) * 17 + math.max(a, b)))
    val cdf = cands.toDF("query_id", "id", "rel")
    val sdf = sims.toDF("query_id", "id_a", "id_b", "sim")
    val agg = Retrieval.mmrRerank(cdf, sdf, k = 4, lambdaPm = 600L)
      .orderBy("query_id", "sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val loop = Retrieval.mmrRerankLoop(cdf, sdf, k = 4, lambdaPm = 600L)
      .orderBy("query_id", "sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(agg.toSeq === loop.toSeq)
    assert(agg.length === 12) // 3 queries × k=4
  }

  test("mmrRerank: k past the candidate count returns all candidates, in order") {
    val cands = Seq((1L, 10L, 500000L), (1L, 11L, 400000L)).toDF("query_id", "id", "rel")
    val sims = Seq((1L, 10L, 11L, 100000L), (1L, 11L, 10L, 100000L))
      .toDF("query_id", "id_a", "id_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, k = 9, lambdaPm = 700L)
      .orderBy("sel_rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 10L), (2L, 11L)))
  }

  test("mmrRerank raises on a candidate missing its sim pair (contract violation is loud)") {
    val cands = Seq((1L, 10L, 500000L), (1L, 11L, 400000L), (1L, 12L, 300000L))
      .toDF("query_id", "id", "rel")
    // 12 has no sim rows at all — the loop used to silently drop it
    val sims = Seq((1L, 10L, 11L, 100000L), (1L, 11L, 10L, 100000L))
      .toDF("query_id", "id_a", "id_b", "sim")
    val eAgg = intercept[Exception] {
      Retrieval.mmrRerank(cands, sims, k = 3, lambdaPm = 700L).collect()
    }
    assert(exceptionChain(eAgg).exists(_.getMessage != null) &&
      exceptionChain(eAgg).exists(m => Option(m.getMessage).exists(_.contains("no sim pair"))))
    val eLoop = intercept[Exception] {
      Retrieval.mmrRerankLoop(cands, sims, k = 3, lambdaPm = 700L).collect()
    }
    assert(exceptionChain(eLoop).exists(m =>
      Option(m.getMessage).exists(_.contains("missing sim pair"))))
  }

  test("mmrRerank raises past maxCandidates (bounded state is loud, not OOM)") {
    val cands = (1L to 5L).map(i => (1L, i, 1000L * i)).toDF("query_id", "id", "rel")
    val sims = (for (a <- 1L to 5L; b <- 1L to 5L if a != b) yield (1L, a, b, 100L))
      .toDF("query_id", "id_a", "id_b", "sim")
    val e = intercept[Exception] {
      Retrieval.mmrRerank(cands, sims, k = 2, lambdaPm = 700L, maxCandidates = 4).collect()
    }
    assert(exceptionChain(e).exists(m =>
      Option(m.getMessage).exists(_.contains("maxCandidates"))))
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    var cur: Throwable = e
    while (cur != null && buf.size < 10) { buf += cur; cur = cur.getCause }
    buf.toSeq
  }
}
