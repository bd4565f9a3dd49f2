package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {

  // Two well-separated planted clusters around e1 and e2, each holding
  // near-duplicate pairs; cross-cluster cosines are ~0.
  private def plantedVectors: Seq[(Long, Array[Float])] = {
    def v(main: Int, eps: Float): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(main) = 1.0f; a(3) = eps; a
    }
    // ids interleave the clusters so the deterministic lowest-id seeding
    // (Similarity.trainCentroids) starts with one seed in each
    Seq(
      (0L, v(0, 0.00f)), (2L, v(0, 0.01f)), (4L, v(0, 0.02f)),
      (1L, v(1, 0.00f)), (3L, v(1, 0.01f)), (5L, v(1, 0.03f)))
  }

  test("semanticNearDupPairs finds within-cluster near-dups and nothing across clusters") {
    val df = spark.createDataFrame(plantedVectors).toDF("id", "vec")
    val pairs = Dedup.semanticNearDupPairs(df, "id", "vec",
      threshold = 0.99, nClusters = 2, refineIters = 2, maxTrainRows = 100L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every within-cluster pair is ~cosine 1 and must be detected
    assert(pairs === Set((0L, 2L), (0L, 4L), (2L, 4L),
      (1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("raising the threshold can only shrink the pair set") {
    val df = spark.createDataFrame(plantedVectors).toDF("id", "vec")
    def n(t: Double) = Dedup.semanticNearDupPairs(df, "id", "vec",
      threshold = t, nClusters = 2, refineIters = 1, maxTrainRows = 100L).count()
    assert(n(0.5) >= n(0.99))
    assert(n(0.999999) <= n(0.99))
  }
}
