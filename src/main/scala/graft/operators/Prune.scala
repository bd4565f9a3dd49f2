package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Sideways information passing for big joins: build a Bloom filter of the
  * dim side's join keys and pre-filter the fact side with it BEFORE the
  * join's exchange — the dominant shuffle-reduction trick at 100 TB when
  * the dim side is selective but too large (or arrives too late in the
  * plan) to broadcast. Spark's optimizer injects the same shape itself
  * when `spark.sql.optimizer.runtime.bloomFilter.enabled` is on; this
  * operator makes the pattern explicit, testable, and available to plans
  * the injection heuristics miss.
  *
  * The sketch is built with one driver-side action over the DIM side only
  * (`df.stat.bloomFilter` — bounded like the IVF centroid model: ~1.2 MB
  * per million keys at 1% fpp) and ships to the fact scan as a foldable
  * binary literal probed by Spark's codegen'd `BloomFilterMightContain`.
  * False positives survive the pre-filter and are removed by the exact
  * join that follows; false negatives are impossible by construction —
  * so the result is EXACTLY the plain join, which is what the q_bloom_join
  * oracle checks.
  */
object Prune {

  /** Serialize a dim column's key set into a Bloom filter sketch. */
  def bloomOfKeys(
      dim: DataFrame,
      keyCol: String,
      expectedKeys: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Pre-filter `fact` rows to those whose `factKey` might be in the
    * sketch — a narrow codegen'd predicate evaluated before any exchange.
    */
  def bloomPrune(fact: DataFrame, factKey: String, bloomBytes: Array[Byte]): DataFrame =
    fact.filter(gfn.might_contain(bloomBytes, col(factKey)))

  /** The composed pattern: sketch the dim keys, prune the fact side,
    * then run the exact equi-join (Catalyst picks the strategy). Result
    * is identical to `fact.join(dim, factKey === dimKey)`.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedDimKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrune(fact, factKey, bloomOfKeys(dim, dimKey, expectedDimKeys, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
