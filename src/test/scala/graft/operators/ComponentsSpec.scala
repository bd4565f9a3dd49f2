package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("minLabel: chains close transitively; shared-larger pairs merge (greedy would over-keep)") {
    // component A: chain 1-2-3-4; component B: 5-9 and 1-9 share 9, so
    // {1,2,3,4,5,9} is ONE component; component C: isolated pair (20,21)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 9L), (5L, 9L), (20L, 21L))
      .toDF("id_a", "id_b")
    val labels = Components.minLabel(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("minLabel converges on a long chain in O(log diameter) rounds") {
    val n = 200
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val labels = Components.minLabel(pairs, maxIters = 12) // log2(200) ~ 8
    assert(labels.filter($"label" =!= 0L).count() == 0) // all collapse to 0
    assert(labels.count() == n + 1)
  }

  test("minLabel refuses to return unconverged labels (silent partial dedup)") {
    val pairs = (0 until 50).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Components.minLabel(pairs, maxIters = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupByComponent keeps one representative per component plus untouched rows") {
    val df = Seq(1L, 2L, 3L, 5L, 9L, 42L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 9L)).toDF("id_a", "id_b")
    val kept = Components.dedupByComponent(df, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 42L))
  }
}
