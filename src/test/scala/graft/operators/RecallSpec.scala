package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Approximation-quality measurement on real testdata (sf0.001, 500
  * vectors): every ANN/LSH variant is measured AGAINST its exact
  * counterpart, because "fast but silently low-recall" is the failure mode
  * the brute-force baselines exist to catch.
  */
class RecallSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("IVF ANN recall@5 beats the random-cell baseline by >= 1.7x at nProbe=4/16") {
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", "vec_id",
      k = 5, nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    info(f"IVF recall@5 (nProbe=4/16): $recall%.3f")
    // These embeddings are near-uniform (no cluster structure), so the
    // theoretical ceiling at 4/16 probed cells is modest; the meaningful
    // check is the lift over probing 4 random cells (= 4/16 = 0.25).
    assert(recall >= 1.7 * (4.0 / 16.0), f"IVF recall lift too low: $recall%.3f")
    // raising nProbe to all cells must recover exactness
    val ivfAll = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", "vec_id",
      k = 5, nCentroids = 16, nProbe = 16)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == bf)
  }

  test("simhash banding has EXACT candidate recall at its Hamming threshold") {
    val docs = Tables.documents(spark, sf).limit(300).cache()
    for (maxHamming <- Seq(3, 12)) {
      val fp = docs.select(col("doc_id").as("id"),
        graft.expressions.functions.simhash64(col("text")).as("fp"))
      val a = fp.select(col("id").as("id_a"), col("fp").as("fp_a"))
      val b = fp.select(col("id").as("id_b"), col("fp").as("fp_b"))
      val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("h", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
        .filter(col("h") <= maxHamming)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = maxHamming)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      info(s"simhash maxHamming=$maxHamming: exact=${exact.size} banded=${banded.size}")
      // pigeonhole banding: candidates are a superset-after-verify EQUAL set
      assert(banded == exact,
        s"banded pairs diverge at maxHamming=$maxHamming: " +
          s"missed=${(exact -- banded).size} extra=${(banded -- exact).size}")
    }
    docs.unpersist()
    ()
  }

  test("hyperplane-LSH near-dup recall vs exact pairs; threshold pairs fully verified") {
    val threshold = 0.35
    val v = emb.select(col("vec_id"), col("embedding"))
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", gfn.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      threshold = threshold, nPlanes = 3, nTables = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives ever (exact verification inside buckets)
    assert(lsh.subsetOf(exact))
    val recall = if (exact.isEmpty) 1.0 else (exact intersect lsh).size.toDouble / exact.size
    info(f"LSH near-dup recall (3 planes x 3 tables, cos>=$threshold): $recall%.3f of ${exact.size} pairs")
    assert(recall >= 0.4, f"LSH recall too low: $recall%.3f")
  }
}
