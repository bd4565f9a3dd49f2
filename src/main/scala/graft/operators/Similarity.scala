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
      nProbe: Int = 4,
      refineIters: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    // Deterministic training: seed with the nCentroids lowest-id vectors,
    // then `refineIters` Lloyd steps (assign -> per-cell mean). Each step is
    // one distributed pass; the centroid table itself stays tiny and is
    // re-broadcast per step.
    import spark.implicits._
    var centroidDf = broadcast(c.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").cast("array<double>").as("cv")))
    for (_ <- 0 until refineIters) {
      val wA = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid").asc)
      val assign = c.crossJoin(centroidDf)
        .withColumn("csim", gfn.cosine_sim(col("v"), col("cv")))
        .withColumn("r", row_number().over(wA))
        .filter(col("r") === 1)
        .select(col("cid"), col("v"))
      val means = assign
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), e => e.getField("m")).as("cv"))
      centroidDf = broadcast(means)
    }

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
