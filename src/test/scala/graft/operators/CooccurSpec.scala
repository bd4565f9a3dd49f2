package graft.operators

import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("bigram counts and margins on a hand-checked corpus") {
    // tokens: doc1 = [a b a b], doc2 = [b a], doc3 = [c] (no pairs)
    val df = Seq("A b. a B!", "b a", "c").toDF("text")
    val out = Cooccur.bigramPmi(df, "text", minCount = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // bigrams: (a b)x2, (b a)x2 — doc boundaries never pair; N=7, B=4
    assert(out.keySet == Set("a b", "b a"))
    val (nab, nxA, nyB, _) = out("a b")
    assert((nab, nxA, nyB) == (2L, 3L, 3L))
    assert(out("b a")._1 == 2L)
    // pmi >= 0 ⇔ n_xy·N² >= B·n_x·n_y: 2·49 = 98 >= 4·9 = 36 → true
    assert(out.values.forall(_._4))
  }

  test("each count table is materialized once — the joined plan reads no corpus scans") {
    val df = Cooccur.bigramPmi(graft.Tables.documents(spark, sf), "text", 2L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the two corpus passes happen inside the localCheckpoint builds; the
    // final join/threshold plan must consume ONLY the materialized tables
    // (without the checkpoints the tokenizer re-scans per consumer —
    // measured 8 parquet scans in this plan)
    assert(!plan.contains("Scan parquet"),
      s"joined plan re-scans the corpus:\n$plan")
  }

  test("single-token and empty docs contribute margins but no pairs") {
    val df = Seq("x", "", "x y").toDF("text")
    val out = Cooccur.bigramPmi(df, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // only one bigram (x y); its n_x margin counts BOTH x occurrences
    assert(out == Map("x y" -> 2L))
  }
}
