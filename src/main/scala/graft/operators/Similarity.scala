package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *   one narrow pass over the corpus computing cosine (fused single-pass
  *   kernel, stays in whole-stage codegen), per-query top-k via window
  *   rank. The corpus is never shuffled on data size, only the final
  *   (query_id, k) rank.
  * - [[ivfTopK]]: scale path — deterministic sampled centroids, corpus
  *   partitioned by nearest-centroid once (write-once, query-many layout at
  *   100 TB), queries probe only the `nProbe` nearest centroid partitions.
  *   Turns full-corpus scans into `nProbe/nCentroids` fraction scans.
  */
object Similarity {

  /** Exact cosine top-k per query. `queries` must be small enough to
    * broadcast (the hint enforces it); corpus-side the plan is scan →
    * broadcast-NL-join → kernel → rank.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", gfn.cosine_sim(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc) // id tiebreak → deterministic
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF-style ANN: assign corpus rows to their nearest of `nCentroids`
    * deterministic sampled centroids; queries search only their `nProbe`
    * nearest centroids' rows. Same output shape as brute force (ANN may
    * miss true neighbors outside probed cells; raise nProbe for recall).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    // Deterministic "training": the nCentroids lowest-id vectors. (A real
    // pipeline would k-means-refine; determinism matters more here and the
    // refinement is orthogonal to the distributed search shape.)
    val centroids = c.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"))
    val centroidDf = broadcast(centroids)

    // Corpus→cell assignment: broadcast NL join + per-row argmax (rank 1).
    val wAssign = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid").asc)
    val assigned = c.crossJoin(centroidDf)
      .withColumn("csim", gfn.cosine_sim(col("v"), col("cv")))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("id"), col("v"), col("cid"))
    // At 100 TB: persist `assigned` partitioned/bucketed BY cid — write once,
    // every query then prunes to nProbe cells via partition pruning.

    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("qsim").desc, col("cid").asc)
    val probes = q.crossJoin(centroidDf)
      .withColumn("qsim", gfn.cosine_sim(col("qv"), col("cv")))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .withColumn("cosine", gfn.cosine_sim(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
