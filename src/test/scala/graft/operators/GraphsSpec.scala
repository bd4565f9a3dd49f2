package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // a directed path 1→2→3→4→5 plus a detour 1→3 (shortcut) and an
  // unreachable island 9→10
  private def pathEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (9L, 10L)
  ).toDF("src", "dst")

  test("bfsHops: min-hop wins over a longer path; unreachable absent") {
    val seeds = Seq(1L).toDF("id")
    val out = Graphs.bfsHops(pathEdges, "src", "dst", seeds, "id", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 is 1 hop via the shortcut, not 2 via the path
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("bfsHops: the cap truncates and seeds always report hop 0") {
    val seeds = Seq(1L, 9L).toDF("id")
    val out = Graphs.bfsHops(pathEdges, "src", "dst", seeds, "id", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 1, 10L -> 1))
    // maxHops = 0: exactly the seed set
    val just = Graphs.bfsHops(pathEdges, "src", "dst", seeds, "id", maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(just == Map(1L -> 0, 9L -> 0))
  }

  test("bfsHops: multi-source takes the nearest seed") {
    val seeds = Seq(1L, 4L).toDF("id")
    val out = Graphs.bfsHops(pathEdges, "src", "dst", seeds, "id", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(5L) == 1) // via seed 4, not 4 hops via seed 1
    assert(out(3L) == 1)
  }

  test("kcoreRounds peels a pendant chain off a triangle") {
    // triangle {1,2,3} (2-core) with a pendant path 3-4-5
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    // round 1 drops 5 (deg 1); round 2 drops 4 (deg fell to 1);
    // round 3 confirms the triangle stable at deg 2
    val out = Graphs.kcoreRounds(pairs, "id_a", "id_b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 2, 3L -> 2))
  }

  test("kcoreRounds honors the FIXED round count (not converged-to-fixpoint)") {
    // chain 1-2-3-4-5 at k=2: each round peels both endpoints; after
    // round 1 survivors {2,3,4}, after round 2 {3}, whose degree is then 0
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val r1 = Graphs.kcoreRounds(chain, "id_a", "id_b", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(r1 == Set(2L, 3L, 4L))
    val r2 = Graphs.kcoreRounds(chain, "id_a", "id_b", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(r2.isEmpty) // 3 survives the degree cut but keeps no edges
  }

  test("bellmanFordRounds relaxes the cheaper two-hop path over the direct edge") {
    // 1→2 (5), 2→3 (5), 1→3 (20): direct is pricier than the detour
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 20L), (9L, 10L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r1 = Graphs.bellmanFordRounds(edges, "src", "dst", "w", seeds, "id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 5L, 3L -> 20L)) // 1 round: direct only
    val r2 = Graphs.bellmanFordRounds(edges, "src", "dst", "w", seeds, "id", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L)) // detour wins; island absent
  }

  test("degreeStats profiles the path graph correctly") {
    // 1→2→3→4→5, shortcut 1→3, island 9→10, plus a mutual pair 4⇄5
    val edges = pathEdges.union(Seq((5L, 4L)).toDF("src", "dst"))
    val r = Graphs.degreeStats(edges, "src", "dst").collect().head
    assert(r.getLong(0) == 7)  // nodes 1..5, 9, 10
    assert(r.getLong(1) == 7)  // 6 path edges + the back edge
    assert(r.getLong(2) == 2)  // 4→5 and 5→4
    assert(r.getLong(3) == 2)  // node 1 out-degree
    assert(r.getLong(4) == 2)  // node 3 in-degree (from 2 and 1)
    assert(r.getLong(5) == 2)  // sources: 1 and 9
    assert(r.getLong(6) == 1)  // sinks: 10 (5 gained an out-edge)
  }

  test("hitsRounds matches the hand-computed integer power iteration") {
    // 1→3, 2→3, 2→4: node 2 links to both authorities (best hub),
    // node 3 is cited by both hubs (best authority)
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Graphs.hitsRounds(edges, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: rawAuth 3←2S, 4←S → a=(S, S/2); rawHub 1←S, 2←1.5S
    //   → h=(666666, S)
    // round 2: rawAuth 3←1666666, 4←1000000 → a=(S, 600000);
    //   rawHub 1←S, 2←1600000 → h=(625000, S)
    assert(out == Map(
      1L -> ((625000L, 0L)),
      2L -> ((1000000L, 0L)),
      3L -> ((0L, 1000000L)),
      4L -> ((0L, 600000L))))
  }

  test("hitsRounds leaves no checkpoint pins behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    Graphs.hitsRounds(edges, "src", "dst", rounds = 2).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"pins leaked: $before -> $after")
  }

  test("kcoreRounds leaves no checkpoint pins behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Graphs.kcoreRounds(pairs, "id_a", "id_b", k = 2, rounds = 2)
    out.collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the final round's eager checkpoint may remain
    assert(after <= before + 1, s"pins leaked: $before -> $after")
  }
}
