package graft.operators

import graft.SparkSpec

/** Seventh-wave operator invariants: hand-checked semantics plus the
  * structural/determinism laws each operator's 100 TB story rests on.
  */
class Wave7Spec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("tokenRuns: hand-checked runs, champion by (len desc, token asc, start asc)") {
    val docs = Seq(
      (1L, "a a a b b c"),        // runs: a×3@0, b×2@3, c×1@5
      (2L, "x y x y"),            // all runs length 1
      (3L, "p p q q")             // tie on len=2: p earlier token wins
    ).toDF("id", "text")
    val got = TextAnalysis.tokenRuns(docs, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(got(0) == ((1L, 6L, 3L, 3L, "a", 0L)))
    assert(got(1) == ((2L, 4L, 4L, 1L, "x", 0L)), got(1).toString)
    assert(got(2) == ((3L, 4L, 2L, 2L, "p", 0L)))
  }

  test("sourceDrift: planted over-represented token found; identical sources have none") {
    val loud = (0 until 30).map(i => (s"d$i", "zzz zzz zzz common"))
    val quiet = (0 until 30).map(i => (s"q$i", "common common plain word"))
    val docs = (loud.map(x => (x._1, x._2, "loud")) ++
      quiet.map(x => (x._1, x._2, "quiet"))).toDF("id", "text", "source")
    val got = TextAnalysis.sourceDrift(docs, "source", "text", minCount = 20L)
      .orderBy("source").collect()
    val byName = got.map(r => r.getString(0) -> r).toMap
    assert(byName("loud").getString(3) == "zzz") // top_token
    assert(byName("loud").getLong(2) >= 1L)      // n_over
    // plain/word are EXCLUSIVE to quiet (c_rest = 0) → capped top score
    assert(byName("quiet").getLong(4) == 1000000L, byName("quiet").toString)

    // identical token distributions: cross-mult is exact equality,
    // never > 2× → no champion anywhere
    val same = (0 until 30).flatMap(i =>
      Seq((s"a$i", "alpha beta beta", "s1"), (s"b$i", "alpha beta beta", "s2")))
      .toDF("id", "text", "source")
    TextAnalysis.sourceDrift(same, "source", "text", minCount = 20L)
      .collect().foreach { r =>
        assert(r.getLong(2) == 0L && r.isNullAt(3), r.toString)
      }
  }

  test("headDupGroups: shared 8-token head groups; short docs excluded") {
    val head = "one two three four five six seven eight"
    val docs = Seq(
      (10L, s"$head tail alpha beta"),
      (20L, s"$head completely different continuation here"),
      (30L, "one two three"), // < 8 tokens: excluded even though prefix matches
      (40L, "unrelated text with eight tokens of its own")
    ).toDF("id", "text")
    val g = Dedup.headDupGroups(docs, "id", "text", nTokens = 8).collect()
    assert(g.length == 1)
    assert(g(0).getLong(1) == 2L && g(0).getLong(2) == 10L && g(0).getLong(3) == 20L)
  }

  test("spanCorruption: stride spacing, no overlap, in_bounds everywhere") {
    val docs = Seq((0L, 100L), (7L, 45L), (19L, 10L), (5L, 3L), (6L, 2L))
      .toDF("id", "n_tok")
    val spans = Packing.spanCorruption(docs, "id", "n_tok", spanLen = 3, stride = 20)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(spans.forall(_._4), "in_bounds certificate must hold everywhere")
    // id=0: phase 0 → starts 0,20,40,60,80 (97 is last legal start)
    assert(spans.filter(_._1 == 0L).map(_._2).toSeq == Seq(0L, 20L, 40L, 60L, 80L))
    // id=7: phase 7, n=45 → starts 7,27 (42 is last legal, 47 > 42)
    assert(spans.filter(_._1 == 7L).map(_._2).toSeq == Seq(7L, 27L))
    // id=19: phase 19, n=10 → no span fits (19 > 10-3)
    assert(!spans.exists(_._1 == 19L))
    // id=5 n=3: exactly one span at... phase 5 > 0 = n-3 → none
    assert(!spans.exists(_._1 == 5L))
    // id=6 n=2: shorter than spanLen → none
    assert(!spans.exists(_._1 == 6L))
    // spans never overlap within a doc (stride 20 > len 3)
    spans.groupBy(_._1).foreach { case (_, ss) =>
      ss.map(_._2).sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 20)
        case _         =>
      }
    }
  }

  test("corpusChecksum: partitioning/order independent; row leg sees what content leg cancels") {
    val docs = (0L until 40L).map(i => (i, s"text body ${i % 10}", s"g${i % 2}"))
      .toDF("id", "text", "grp")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Integrity.corpusChecksum(df, "grp", "id", "text")
        .orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val base = sums(docs)
    assert(sums(docs.repartition(13)) == base, "repartition must not change checksums")
    assert(sums(docs.orderBy(col("id").desc)) == base, "row order must not change checksums")
    // add a duplicate PAIR of an existing text: content_xor unchanged
    // (parity blind spot), row_xor and n_docs both move
    val dup = docs.union(Seq((100L, "text body 1", "g0"), (101L, "text body 1", "g0"))
      .toDF("id", "text", "grp"))
    val d = sums(dup).find(_._1 == "g0").get
    val b = base.find(_._1 == "g0").get
    assert(d._2 == b._2 + 2 && d._3 == b._3 && d._4 != b._4,
      s"content_xor should cancel the pair, row_xor must not: base=$b dup=$d")
  }

  test("booleanSearch: AND cuts, rarer term weighs more, rank total") {
    val docs = Seq(
      (1L, "spark vector spark"),     // tf: spark 2, vector 1
      (2L, "spark spark spark"),      // missing vector → excluded
      (3L, "vector vector spark"),    // tf: spark 1, vector 2
      (4L, "neither of them here")
    ).toDF("id", "text")
    val got = Retrieval.booleanSearch(docs, "id", "text", Seq("spark", "vector"), 10)
      .orderBy("rk").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(3L, 1L),
      s"vector is rarer (df 2 vs 3) so doc 3 outranks doc 1: ${got.toSeq}")
    assert(got.map(_._3).toSeq == Seq(1L, 2L))
  }

  test("stratifiedSplit: exact floor-cut sizes per stratum, deterministic under repartition") {
    val docs = (0L until 200L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSplit(df, Seq("stratum"), "id",
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = splits(docs)
    assert(splits(docs.repartition(7)) == a, "assignment must be partitioning-independent")
    val byStratum = a.groupBy { case (id, _) => id % 3 }
    byStratum.foreach { case (_, m) =>
      val n = m.size
      val train = m.count(_._2 == "train")
      val vl = m.count(_._2 == "val")
      val test = m.count(_._2 == "test")
      assert(train == n * 8 / 10, s"train exact floor: $train vs ${n * 8 / 10}")
      assert(train + vl == n * 9 / 10, s"train+val exact floor")
      assert(train + vl + test == n)
    }
  }
}
