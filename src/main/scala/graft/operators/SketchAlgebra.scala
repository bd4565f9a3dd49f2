package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.KmvSketchAgg

/** KMV sketch SET ALGEBRA (Bar-Yossef et al. 2002; Beyer et al. 2007
  * for the union/intersection estimators) — pairwise distinct-set
  * overlap between groups from k-long signatures instead of element
  * streams: the "how much does source A's corpus overlap source B's"
  * matrix at 100 TB, where shipping per-source element sets is
  * impossible but k longs per source is free.
  *
  * Because the signatures are k smallest values of the PORTABLE md5
  * hash ([[Sampling.portableUniform]]), every derived quantity is
  * bit-replayable in any engine: merged pair signature = k smallest of
  * the union of the two signatures (a set identity — KMV(A∪B) is
  * exactly the k smallest of KMV(A) ∪ KMV(B)), union estimate =
  * (k-1)·2^32 div h_k, intersection estimate = n_common·est_union div k
  * where n_common counts merged-signature elements present in BOTH
  * signatures (the Beyer et al. Jaccard estimator, all integer
  * arithmetic).
  *
  * Scale shape: one distinct-(group, hash) exchange, then the KMV
  * TypedImperativeAggregate (map-side partials, k-long state — the
  * element stream never reaches the reduce side), then all pair
  * arithmetic on a |groups|-row frame. The EXACT legs (per-group
  * distinct counts, pairwise exact intersection via the hash-keyed
  * self-join) exist only to ground the certificates at oracle scale —
  * the 100 TB deployment ships the sketch path alone.
  */
object SketchAlgebra {

  /** Pairwise KMV union/intersection estimates with exact-leg
    * certificates. Input: one row per element occurrence; `groupCol`
    * the set id, `elemCol` the element (hashed portably inside).
    * Output per unordered group pair (a < b): exact distinct counts,
    * the estimates, and the two pinned error certificates
    * (union within [3/4, 5/4]× exact; intersection within ±union/4 —
    * measured 0.83–0.97 and ±0.18 on this corpus at k=64, falsifiable
    * but held with margin).
    */
  def kmvPairwise(
      df: DataFrame,
      groupCol: String,
      elemCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val estNum = (k - 1L) * 4294967296L
    val h = df
      .filter(col(groupCol).isNotNull && col(elemCol).isNotNull)
      .select(col(groupCol).as("g"),
        Sampling.portableUniform(col(elemCol)).as("hv"))
      .distinct()
    val sigs = h.groupBy(col("g"))
      .agg(KmvSketchAgg.kmv_sketch(col("hv"), k).as("sig"),
        count(lit(1)).as("nd"))
    val pairs = sigs.select(col("g").as("src_a"), col("sig").as("s_a"), col("nd").as("nd_a"))
      .join(sigs.select(col("g").as("src_b"), col("sig").as("s_b"), col("nd").as("nd_b")),
        col("src_a") < col("src_b"))
      .withColumn("mg", slice(array_sort(array_union(col("s_a"), col("s_b"))), 1, k))
      .withColumn("est_union",
        when(size(col("mg")) < k, size(col("mg")).cast("long"))
          .otherwise(expr(s"${estNum}L div greatest(element_at(mg, $k), 1L)")))
      .withColumn("n_common",
        size(array_intersect(col("mg"), array_intersect(col("s_a"), col("s_b"))))
          .cast("long"))
      .withColumn("est_inter", expr(s"(n_common * est_union) div $k"))
    val inter = h.select(col("g").as("src_a"), col("hv"))
      .join(h.select(col("g").as("src_b"), col("hv")), Seq("hv"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("nd_a") + col("nd_b") - col("n_inter"))
      .withColumn("union_ok",
        col("est_union") * 4 >= col("n_union") * 3 &&
          col("est_union") * 4 <= col("n_union") * 5)
      .withColumn("inter_ok",
        abs(col("est_inter") - col("n_inter")) * 4 <= col("n_union"))
      .select(col("src_a"), col("src_b"), col("nd_a"), col("nd_b"),
        col("n_union"), col("n_inter"), col("est_union"), col("n_common"),
        col("est_inter"), col("union_ok"), col("inter_ok"))
  }
}
