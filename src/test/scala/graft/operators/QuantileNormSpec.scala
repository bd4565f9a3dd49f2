package graft.operators

import graft.SparkSpec

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked pooled mapping: ranks land on pooled order statistics") {
    // pooled sorted values: [10, 10, 20, 30, 40] (N = 5)
    val df = Seq(
      (1L, "A", 10L), (2L, "A", 20L),
      (3L, "B", 10L), (4L, "B", 30L), (5L, "B", 40L)).toDF("id", "g", "v")
    val out = QuantileNorm.normalize(df, "g", "v", "id")
      .select("id", "src_rank", "target_idx", "norm_val")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // A (n=2): rank 0 -> idx 0 -> 10; rank 1 -> idx (1*4)/1 = 4 -> 40
    // B (n=3): rank 0 -> 10; rank 1 -> idx (1*4)/2 = 2 -> 20; rank 2 -> 40
    assert(out === Seq(
      (1L, 0L, 0L, 10L), (2L, 1L, 4L, 40L),
      (3L, 0L, 0L, 10L), (4L, 1L, 2L, 20L), (5L, 2L, 4L, 40L)))
  }

  test("singleton group maps to the pooled minimum (target_idx 0)") {
    val df = Seq((1L, "A", 50L), (2L, "A", 60L), (3L, "C", 99L))
      .toDF("id", "g", "v")
    val out = QuantileNorm.normalize(df, "g", "v", "id")
      .filter($"id" === 3L).select("target_idx", "norm_val")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((0L, 50L)))
  }

  test("value ties break by id: the rank (hence mapping) is a total order") {
    val df = Seq((2L, "A", 7L), (1L, "A", 7L)).toDF("id", "g", "v")
    val out = QuantileNorm.normalize(df, "g", "v", "id")
      .select("id", "src_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out === Array((1L, 0L), (2L, 1L)))
  }
}
