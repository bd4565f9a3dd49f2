package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection (the submodular facility-location
  * pick): k rounds, each selecting the item covering the most
  * still-uncovered elements. Nemhauser, Wolsey & Fisher (1978) give the
  * (1 - 1/e) approximation guarantee that makes this THE standard
  * data-selection primitive (vocabulary / skill coverage subsets for
  * training mixtures).
  *
  * 100 TB shape: the (item, element) incidence set is the only
  * corpus-sized state, checkpoint-pinned once so the k rounds re-scan
  * IT, not the corpus it came from. Each round is one distributed
  * anti-join (uncovered remainder) + one aggregate + a 1-row argmax;
  * only that single winning row ever reaches the driver — O(k) driver
  * state, the bounded-model discipline. The covered set grows by
  * distinct-union per round (element-spine-sized, k unions deep —
  * checkpoint it too for very large k).
  */
object SetCover {

  /** Greedy picks over `df`'s (`idCol`, `elemCol`) incidence pairs
    * (duplicates tolerated — they are collapsed up front). Returns
    * (round, `idCol`, gain) with rounds 1..k in order; stops early
    * (fewer than k rows) once every element is covered. Ties on gain
    * break toward the smallest id, so the pick sequence is a pure
    * function of the data on any engine or partitioning.
    */
  def greedyMaxCoverage(
      df: DataFrame,
      idCol: String,
      elemCol: String,
      k: Int): Seq[(Int, Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val td = df.select(col(idCol).cast("long").as("__id"),
        col(elemCol).as("__elem"))
      .distinct()
      .localCheckpoint(false)
    var covered = td.select(col("__elem")).limit(0)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val winner = td.join(covered, Seq("__elem"), "left_anti")
        .groupBy(col("__id")).agg(count(lit(1)).as("__gain"))
        .orderBy(col("__gain").desc, col("__id")).limit(1)
        .collect() // exactly one row per round: the greedy's O(k) state
      if (winner.isEmpty) exhausted = true
      else {
        val row = winner.head
        val id = row.getLong(0)
        picks += ((r, id, row.getLong(1)))
        covered = covered
          .union(td.filter(col("__id") === id).select("__elem"))
          .distinct()
      }
    }
    picks.toSeq
  }
}
