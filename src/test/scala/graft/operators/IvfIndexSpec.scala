package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The write-once IVF layout ([[Similarity.writeIndex]]/[[queryIndex]]):
  * results must equal the ad-hoc [[Similarity.ivfTopK]] at identical
  * parameters, the model must round-trip its JSON serialization, and —
  * the point of the layout — the query's parquet scan must carry the
  * probed cells as PartitionFilters (partition pruning), not read the
  * whole index.
  */
class IvfIndexSpec extends SparkSpec {

  test("indexed IVF equals ad-hoc IVF and prunes partitions at the scan") {
    val emb = graft.Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") >= 5)
    val queries = emb.filter(col("vec_id") < 5)
    val dir = Files.createTempDirectory("ivfindex").toString

    val model = Similarity.writeIndex(corpus, "vec_id", "embedding", dir,
      nCentroids = 8, refineIters = 1)
    assert(model.centroids.length == 8)

    // model JSON round-trips exactly
    val rt = Similarity.IvfModel.fromJson(model.toJson)
    assert(rt.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)

    val indexed = Similarity.queryIndex(spark, dir, queries, "vec_id", "embedding",
      k = 3, nProbe = 2)
    val adhoc = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", "vec_id",
      k = 3, nCentroids = 8, nProbe = 2)
    val a = indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = adhoc.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b, s"indexed=$a adhoc=$b")

    // partition pruning: the scan plan lists cid as a partition filter and
    // the executed input is a strict subset of the 8 cells
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"no partition filter in plan:\n${plan.take(2000)}")
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .count(_.getName.startsWith("cid="))
    assert(cellDirs == 8, s"expected 8 cell partitions, found $cellDirs")
  }
}
