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

  /** The sketch/probe pair only agree for integral keys: the build side
    * inserts longs (`putLong`) and `BloomFilterMightContain` probes with
    * `mightContainLong`, while a string key would be INSERTED as UTF-8
    * bytes but PROBED as a (null or differently-hashed) long — silent
    * false negatives. Fail loudly instead.
    */
  private def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"bloom pruning requires an integral key; '$keyCol' is $dt — " +
        "hash non-integral keys to a long (e.g. xxhash64) on BOTH sides first")
  }

  /** Serialize a dim column's key set into a Bloom filter sketch.
    * `expectedKeys < 0` derives the capacity with a count over the dim
    * side (one cheap extra job) — an under-sized sketch saturates toward
    * fpp 1 and silently stops pruning, so auto-sizing is the safe default
    * when the dim cardinality isn't known.
    */
  def bloomOfKeys(
      dim: DataFrame,
      keyCol: String,
      expectedKeys: Long = -1L,
      fpp: Double = 0.01): Array[Byte] = {
    requireIntegralKey(dim, keyCol)
    val n = if (expectedKeys >= 0) expectedKeys else math.max(dim.count(), 1L)
    val bf = dim.stat.bloomFilter(keyCol, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Pre-filter `fact` rows to those whose `factKey` might be in the
    * sketch — a narrow codegen'd predicate evaluated before any exchange.
    */
  def bloomPrune(fact: DataFrame, factKey: String, bloomBytes: Array[Byte]): DataFrame = {
    requireIntegralKey(fact, factKey)
    fact.filter(gfn.might_contain(bloomBytes, col(factKey)))
  }

  /** The composed pattern: sketch the dim keys, prune the fact side,
    * then run the exact equi-join (Catalyst picks the strategy). Result
    * is identical to `fact.join(dim, factKey === dimKey)`.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedDimKeys: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrune(fact, factKey, bloomOfKeys(dim, dimKey, expectedDimKeys, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
