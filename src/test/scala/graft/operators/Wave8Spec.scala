package graft.operators

import graft.SparkSpec

/** Eighth-wave operator invariants. */
class Wave8Spec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("noveltyProfile: first occurrence owns the gram; exact copies score zero") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base),                       // everything first-seen here
      (2L, base),                       // exact copy → 0 novel
      (3L, s"$base brand new suffix words") // shares the head, adds a tail
    ).toDF("id", "text")
    val got = Dedup.noveltyProfile(docs, "id", "text", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0)._3 == got(0)._2 && got(0)._4 == 1000L, s"doc 1 all novel: ${got(0)}")
    assert(got(1)._3 == 0L && got(1)._4 == 0L, s"copy scores zero: ${got(1)}")
    assert(got(2)._3 > 0L && got(2)._3 < got(2)._2, s"tail-only novelty: ${got(2)}")
  }

  test("datasetDiff: added/removed/changed/same each classified") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "text")
    val b = Seq((1L, "one"), (2L, "two CHANGED"), (4L, "four")).toDF("id", "text")
    val got = Integrity.datasetDiff(a, b, "id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("same") == ((1L, 1L)))
    assert(got("changed") == ((1L, 2L)))
    assert(got("removed") == ((1L, 3L)))
    assert(got("added") == ((1L, 4L)))
  }

  test("compactionPlan: greedy cum-div bins, certificate holds, oversize file isolated-safe") {
    val files = Seq(
      ("p", 1L, 300L), ("p", 2L, 300L), // bin 0: cum_before 0, 300
      ("p", 3L, 300L),                  // bin 1: cum_before 600
      ("p", 4L, 1200L),                 // bin 1 start (cum 900) — straddles
      ("p", 5L, 100L),                  // cum 2100 → bin 4
      ("q", 9L, 50L)                    // separate partition
    ).toDF("part", "file", "size")
    val got = Layout.compactionPlan(files, "part", "file", "size", targetSize = 500L)
      .orderBy("part", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(7)))
    // p: bins by cum_before div 500: f1@0→0, f2@300→0, f3@600→1, f4@900→1, f5@2100→4
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == Seq(
      ("p", 0L, 2L, 600L), ("p", 1L, 2L, 1500L), ("p", 4L, 1L, 100L),
      ("q", 0L, 1L, 50L)))
    assert(got.forall(_._5), s"greedy bound total < target + max must hold: ${got.toSeq}")
  }
}
