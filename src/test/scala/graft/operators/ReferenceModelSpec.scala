package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized reference-model checks: each operator is replayed by a
  * naive in-memory Scala implementation over seeded random inputs, so
  * the distributed plan is graded against an independent derivation of
  * the same semantics (the in-JVM analog of the DuckDB oracles, with
  * adversarial inputs the fixtures don't contain — tiny alphabets to
  * force shingle collisions, token counts straddling the bin size,
  * overlapping rank lists).
  */
class ReferenceModelSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateSpans matches a brute-force reference on collision-heavy strings") {
    val rnd = new scala.util.Random(20260813L)
    val k = 3
    // alphabet of 3 chars and length <= 24 force rich duplication
    val docs = (0L until 30L).map { id =>
      val len = 5 + rnd.nextInt(20)
      (id, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
    }
    // naive: global multiset of k-grams, then per-doc merged spans
    val counts = docs.flatMap { case (_, t) =>
      (0 to t.length - k).map(p => t.substring(p, p + k))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val expect = docs.map { case (id, t) =>
      val dupPos = (0 to t.length - k).filter(p => counts(t.substring(p, p + k)) >= 2)
      var spans = List.empty[(Int, Int)] // merged, reverse order
      dupPos.foreach { p =>
        spans match {
          case (s0, e0) :: rest if p <= e0 => spans = (s0, math.max(e0, p + k)) :: rest
          case _ => spans = (p, p + k) :: spans
        }
      }
      (id, t.length.toLong, spans.length.toLong, spans.map { case (s, e) => e - s }.sum.toLong)
    }.toSet
    val got = Dedup.duplicateSpans(docs.toDF("id", "text"), "id", "text", k,
      hashShingles = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("packGreedy matches a sequential reference fold on random token streams") {
    val rnd = new scala.util.Random(42L)
    val binSize = 50
    val nShards = 4
    val docs = (0L until 120L).map(id => (id, 1L + rnd.nextInt(70))) // some oversized
    val expect = docs.groupBy(_._1 % nShards).flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L; var first = true
      ds.sortBy(_._1).map { case (id, tok) =>
        if (first) { first = false; fill = tok }
        else if (fill + tok <= binSize) fill += tok
        else { bin += 1; fill = tok }
        (id, shard, tok, bin, fill)
      }
    }.toSet
    val got = Packing.packGreedy(docs.toDF("id", "tok"), "id", "tok", binSize, nShards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("rrfFuse matches a naive blend on random overlapping rank lists") {
    val rnd = new scala.util.Random(7L)
    val ids = (1L to 40L).toVector
    def ranking(): Map[Long, Int] =
      rnd.shuffle(ids).take(15).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    (1 to 5).foreach { _ =>
      val a = ranking(); val b = ranking()
      val naive = (a.keySet ++ b.keySet).toSeq.map { id =>
        val s = a.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          b.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (id, s)
      }.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) =>
          (id, a.getOrElse(id, 0).toLong, b.getOrElse(id, 0).toLong, i + 1)
        }
      val got = Retrieval.rrfFuse(
        Seq("a" -> a.toSeq.toDF("id", "rank"), "b" -> b.toSeq.toDF("id", "rank")),
        "id", kConst = 60, topK = 10)
        .orderBy("fused_rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(got.toSeq == naive, s"a=$a\nb=$b")
    }
  }
}
