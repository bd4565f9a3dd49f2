package graft.operators

import graft.SparkSpec

class VocabSpec extends SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (1L, "a b a c"), (2L, "a b zz"), (3L, "c a"))).toDF("doc_id", "text")

  test("buildVocab ranks by frequency then token, capped at size") {
    // freqs: a=4, b=2, c=2, zz=1 → ids a=1, b=2, c=3 (tie b<c), zz=4
    val v = TextAnalysis.buildVocab(docs, "text", size = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("phantom empty tokens from doubled spaces never enter the vocab") {
    val messy = spark.createDataFrame(Seq(
      (1L, "x  x "), (2L, " x"))).toDF("doc_id", "text") // 3 empties, 3 x's
    val v = TextAnalysis.buildVocab(messy, "text", size = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("x" -> 1L))
    // the empty positions survive encoding as OOV, keeping offsets honest
    val enc = TextAnalysis.encodeTokens(messy.filter("doc_id = 1"), "doc_id", "text",
      TextAnalysis.buildVocab(messy, "text", size = 2))
      .orderBy("pos").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(enc.toSeq === Seq((0, 1L), (1, 0L), (2, 1L), (3, 0L)))
  }

  test("encodeTokens emits positional ids with OOV as 0") {
    val vocab = TextAnalysis.buildVocab(docs, "text", size = 3)
    val enc = TextAnalysis.encodeTokens(docs.filter("doc_id = 2"), "doc_id", "text", vocab)
      .orderBy("pos").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(enc.toSeq === Seq((0, 1L), (1, 2L), (2, 0L))) // "a b zz" → zz OOV
  }
}
