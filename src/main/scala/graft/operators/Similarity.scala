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
      refineIters: Int = 1,
      maxTrainRows: Long = 100000L): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    // The centroid model lives on the driver (nCentroids × dim doubles — a
    // few KB, the footprint of any broadcast k-means model) and rides into
    // the plan as an expression literal. Training is deterministic and runs
    // on a BOUNDED sample: centroid quality needs ~thousands of vectors,
    // not the corpus, so the Lloyd pass must not posexplode 100 TB by dim×.
    // The sample is hash-stratified (`xxhash64(id) % mod == 0` — same key,
    // same membership regardless of partitioning, the Sampling.hashSplit
    // discipline), sized by one column-pruned count; pass an explicit
    // `maxTrainRows` to tune. Seeding (nCentroids lowest-id vectors) and
    // every Lloyd step then scan only the sample. Each step is a NARROW
    // nearest-centroid projection (no join, no shuffle of vectors) followed
    // by a map-side-combined groupBy of (cid, pos, x) triples — every task
    // emits at most nCentroids × dim partial rows regardless of sample size.
    val corpusRows = c.count()
    val trainMod = math.max(1L, corpusRows / math.max(1L, maxTrainRows))
    val train =
      if (trainMod == 1L) c
      else c.filter(pmod(xxhash64(col("id")), lit(trainMod)) === 0)
    var centroids: Array[Array[Double]] = train.orderBy(col("id")).limit(nCentroids)
      .select(col("v").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until refineIters) {
      val meanRows = train
        .select(gfn.nearest_centroid(col("v"), centroids).as("cid"),
          posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
        // ragged corpus vectors longer than the seed dimension would index
        // past the centroid arrays below — drop the excess positions here,
        // inside the distributed aggregation
        .filter(col("pos") < lit(dim))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone()) // cells that lost all rows keep their centroid
      meanRows.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }

    // Corpus→cell assignment: zero-shuffle codegen projection.
    val assigned = c.withColumn("cid", gfn.nearest_centroid(col("v"), centroids))
    // At 100 TB: persist `assigned` partitioned/bucketed BY cid — write once,
    // every query then prunes to nProbe cells via partition pruning.

    import spark.implicits._
    val centroidDf = broadcast(
      centroids.zipWithIndex.map { case (cv, i) => (i, cv) }.toSeq
        .toDF("cid", "cv"))
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
