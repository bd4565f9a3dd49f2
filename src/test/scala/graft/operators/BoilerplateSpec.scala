package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("scrub removes exactly the positions covered by cross-doc-frequent trigrams") {
    // "x y z" recurs in docs 1-3 (>= 3 distinct docs); "p q r" only in doc 4.
    val df = Seq(
      (1L, "x y z a b"),
      (2L, "c x y z"),
      (3L, "x y z"),
      (4L, "p q r p q r"), // frequent WITHIN one doc only — not boilerplate
      (5L, "lone")
    ).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentNgrams(df, "doc_id", "text", n = 3, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((5L, 3L, "a b")))
    assert(out(2L) == ((4L, 3L, "c")))
    assert(out(3L) == ((3L, 3L, "")))
    // within-doc repetition counts ONE distinct doc — nothing scrubbed
    assert(out(4L) == ((6L, 0L, "p q r p q r")))
    assert(out(5L) == ((1L, 0L, "lone")))
  }

  test("scrub: overlapping frequent trigrams merge their coverage, not double-count") {
    // "a b c d" in 3 docs → trigrams "a b c" and "b c d" both frequent;
    // coverage of positions 0..3 is 4 tokens, not 6.
    val df = Seq((1L, "a b c d x"), (2L, "a b c d"), (3L, "y a b c d")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentNgrams(df, "doc_id", "text", n = 3, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, "x")))
    assert(out(2L) == ((4L, "")))
    assert(out(3L) == ((4L, "y")))
  }

  test("bigram familiarity: planted familiar pair, short docs degenerate to true") {
    // "a b" occurs 3 times across the corpus; "q z" once.
    val df = Seq(
      (1L, "a b q z"), // bigrams: a-b (fam), b-q, q-z → 1/3 familiar
      (2L, "a b"),     // 1/1
      (3L, "a b"),     // 1/1
      (4L, "solo"),    // 0 bigrams → 0 >= 0 majority holds
      (5L, "")
    ).toDF("doc_id", "text")
    val out = Boilerplate.bigramFamiliarity(df, "doc_id", "text", minCount = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((3L, 1L, false)))
    assert(out(2L) == ((1L, 1L, true)))
    assert(out(3L) == ((1L, 1L, true)))
    assert(out(4L) == ((0L, 0L, true)))
    assert(out(5L) == ((0L, 0L, true)))
  }

  test("tfidf top-k: rare terms outrank common ones; ties break on the term string") {
    // 3 docs; "common" in all (df=3), "rare" only in doc 1 (df=1).
    val df = Seq(
      (1L, "common rare common"),
      (2L, "common zeta alpha"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val out = Boilerplate.tfidfTopK(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Long]("score_key")))
      .toMap
    // doc 1: rare tf=1 df=1 → 3e6; common tf=2 df=3 → 2e6
    assert(out((1L, 1))._1 == "rare" && out((1L, 1))._2 == 3000000L)
    assert(out((1L, 2))._1 == "common" && out((1L, 2))._2 == 2000000L)
    // doc 2: alpha and zeta tie (tf=1, df=1) → term order decides
    assert(out((2L, 1))._1 == "alpha")
    assert(out((2L, 2))._1 == "zeta")
    // doc 3: only "common" → exactly one row
    assert(out.keys.count(_._1 == 3L) == 1)
  }

  test("tfidf: the count-table pass is materialized — final plan reads no corpus") {
    val df = Boilerplate.tfidfTopK(graft.Tables.documents(spark, sf), "doc_id", "text", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), s"ranked plan re-scans the corpus:\n$plan")
  }

  test("scrub/familiarity: corpus passes stay CONSTANT (frequent sets checkpointed)") {
    def scans(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    }
    val docs = graft.Tables.documents(spark, sf)
    // AQE prints each scan twice (initial + final plan), so the string
    // count is 2x the logical pass count.
    // scrub: coverage grams + token stream + report spine = 3 logical
    // passes in the final plan (the frequent-set build runs inside its
    // checkpoint); without the checkpoint this was 8 (the Cooccur trap)
    assert(scans(Boilerplate.scrubFrequentNgrams(docs, "doc_id", "text", 3, 4L)) <= 6)
    // familiarity: per-doc bigram side + report spine = 2
    assert(scans(Boilerplate.bigramFamiliarity(docs, "doc_id", "text", 30L)) <= 4)
  }
}
