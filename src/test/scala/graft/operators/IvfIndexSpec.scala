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

    // Partition pruning, asserted on the TYPED plan (a string-contains
    // check would pass for any partitioned scan): the cells scan must
    // carry a cid predicate in partitionFilters — the filter Spark uses
    // to prune partition directories before listing files — not merely in
    // dataFilters. A single-query probe (nProbe=2 of 8 cells) guarantees
    // the isin list is a strict subset.
    val one = Similarity.queryIndex(spark, dir,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3, nProbe = 2)
    assert(one.count() > 0)
    val scans = one.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("cells")) => f
    }
    assert(scans.nonEmpty, "no file scan over the index cells found")
    val pf = scans.head.partitionFilters.map(_.toString)
    assert(pf.exists(s => s.contains("cid") && (s.contains("IN") || s.contains("in("))),
      s"cid isin(...) did not reach the scan's partitionFilters: $pf")

    // cells that lose every corpus row legitimately produce no cid= dir —
    // require only that the layout is partitioned and within the model size
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .count(_.getName.startsWith("cid="))
    assert(cellDirs > 0 && cellDirs <= 8, s"unexpected cell partition count $cellDirs")
  }

  test("appendToIndex: append+serve equals frozen-model full encode+serve; staleness tracked") {
    val emb = graft.Tables.embeddings(spark, sf)
    val partA = emb.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 0)
    val partB = emb.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 1)
    val queries = emb.filter(col("vec_id") < 5)

    // index trained on A only, then B appended with FROZEN centroids
    val dirApp = Files.createTempDirectory("ivfappend").toString
    val m0 = Similarity.writeIndex(partA, "vec_id", "embedding", dirApp,
      nCentroids = 8, refineIters = 1)
    assert(m0.appendedRows == 0L && m0.baseRows > 0L && m0.stalenessPm == 0L)
    val m1 = Similarity.appendToIndex(spark, dirApp, partB, "vec_id", "embedding")
    assert(m1.baseRows == m0.baseRows)
    assert(m1.appendedRows == partB.count())
    // staleness row persists through the JSON round trip
    val reread = Similarity.readModel(spark, dirApp)
    assert(reread.appendedRows == m1.appendedRows && reread.baseRows == m1.baseRows)
    assert(reread.stalenessPm ==
      m1.appendedRows * 1000 / (m1.baseRows + m1.appendedRows))

    // the rebuild leg: encode A∪B in ONE index but with the SAME frozen
    // model (cell assignment is a pure function of vector+centroids, so
    // this is exactly what a from-scratch encode with m0 produces)
    val dirFull = Files.createTempDirectory("ivffull").toString
    Similarity.writeIndex(partA, "vec_id", "embedding", dirFull,
      nCentroids = 8, refineIters = 1) // same train input → same centroids
    Similarity.appendToIndex(spark, dirFull, partB, "vec_id", "embedding")
    val servedApp = Similarity.queryIndex(spark, dirApp, queries,
      "vec_id", "embedding", k = 4, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // independent ground truth: the ad-hoc IVF job over A∪B with m0
    val adhoc = Similarity.ivfTopK(partA.unionByName(partB), queries,
      "vec_id", "embedding", "vec_id", k = 4, nCentroids = 8, nProbe = 3,
      model = Some(m0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(servedApp == adhoc, s"append+serve=$servedApp adhoc=$adhoc")

    // legacy bare-array model.json still parses (counts default to 0)
    val legacy = Similarity.IvfModel.fromJson(
      m0.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
    assert(legacy.centroids.map(_.toSeq).toSeq == m0.centroids.map(_.toSeq).toSeq)
    assert(legacy.baseRows == 0L && legacy.stalenessPm == 0L)
  }
}
