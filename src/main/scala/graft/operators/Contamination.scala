package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Benchmark decontamination: measure and remove training documents whose
  * word n-gram shingles overlap an evaluation/benchmark set — the standard
  * guard against test-set leakage when assembling a training corpus.
  *
  * Plan shape at 100 TB: the benchmark side (eval sets — thousands of
  * documents, not billions) reduces to a DISTINCT hash column and
  * BROADCASTS; the corpus does ONE codegen'd shingling pass, explodes
  * (id, hash) pairs, semi-joins the broadcast hash set (no corpus
  * shuffle), and partially aggregates match counts per id — every task
  * emits at most its distinct-id count. The only corpus-wide shuffle
  * carries 16-byte (id, count) rows.
  */
object Contamination {

  /** Per-document overlap report: id, shingle count, matched count, and
    * `contamination` = matched/total fraction in [0, 1].
    */
  def overlap(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingleN: Int = 3,
      asciiShingles: Boolean = false): DataFrame = {
    val benchHashes = benchmark
      .select(explode(gfn.shingle_hashes(col(benchTextCol), shingleN, asciiShingles)).as("h"))
      .distinct()
      .withColumn("__hit", lit(1L))
    // ONE shingling pass: size + exploded hashes from the same projection
    // (explode_outer keeps shingle-less docs), broadcast LEFT join marks
    // matches, and a single map-side-combined aggregate produces both the
    // total and matched counts per id.
    corpus.select(col(idCol).as("id"),
        gfn.shingle_hashes(col(textCol), shingleN, asciiShingles).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode_outer(col("sh")).as("h"))
      .join(broadcast(benchHashes), Seq("h"), "left")
      .groupBy(col("id"))
      .agg(first(col("n_sh")).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        round(col("n_matched") / greatest(col("n_shingles"), lit(1L)), 4)
          .as("contamination"))
  }

  /** Corpus minus contaminated documents (overlap fraction >= threshold). */
  def decontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val flagged = overlap(corpus, idCol, textCol, benchmark, benchTextCol, shingleN)
      .filter(col("contamination") >= threshold)
      .select(col("id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
