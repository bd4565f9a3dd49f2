package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Consistency between [[TextAnalysis.stopwordCounts]] (q_codeswitch's
  * substrate) and [[TextAnalysis.langId]] (q_langid's): langId IS the
  * argmax of the exposed counts (first lexicon wins ties, "und" on
  * all-zero) — one contract, two views, so they cannot drift apart.
  */
class StopwordCountsSpec extends SparkSpec {

  test("langId == argmax(stopwordCounts) on the documents corpus") {
    val counts = TextAnalysis.stopwordCounts(col("text"))
    val langs = counts.map(_._1)
    val df = graft.Tables.documents(spark, sf)
      .select(col("doc_id") +: TextAnalysis.langId(col("text")).as("pred") +:
        counts.map { case (l, c) => c.as(s"cnt_$l") }: _*)
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val cs = langs.zipWithIndex.map { case (l, i) => l -> r.getLong(2 + i) }
      val best = cs.map(_._2).max
      val expected = if (best == 0L) "und" else cs.find(_._2 == best).get._1
      assert(r.getString(1) == expected,
        s"doc ${r.getLong(0)}: pred ${r.getString(1)} != argmax $expected ($cs)")
    }
  }

  test("mixed-language text hits two lexicons (the q_codeswitch signal)") {
    import spark.implicits._
    val mixed = Seq((1L,
      "the cat and the dog is in the house " + // en stopwords
        "der Hund und die Katze ist nicht mit")) // de stopwords
      .toDF("doc_id", "text")
    val counts = TextAnalysis.stopwordCounts(col("text"))
    val row = mixed.select(counts.map { case (l, c) => c.as(l) }: _*).head()
    val en = row.getLong(row.fieldIndex("en"))
    val de = row.getLong(row.fieldIndex("de"))
    assert(en >= 2L && de >= 2L, s"en=$en de=$de")
  }
}
