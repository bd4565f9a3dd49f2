package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a PORTABLE relational build: `d` independent hash
  * rows of `w` buckets, one count per (row, bucket) cell, point estimate
  * = min over rows (Cormode & Muthukrishnan, J. Algorithms 2005). Unlike
  * the usual opaque binary sketch, the hash family here is the md5-prefix
  * uniform (`md5(j || ":" || key)` mod `w`) — bit-identical in any engine
  * with md5, so the ENTIRE sketch (every cell and every estimate) is
  * replayable — and therefore oracle-checkable — outside Spark.
  *
  * 100 TB shape: the explode multiplies scan rows by `d`, but hash
  * aggregation partials collapse each task's output to at most `d·w`
  * cells BEFORE the exchange, so the shuffle carries O(tasks · d · w)
  * rows — never the corpus. The finished sketch is `d·w` rows total: a
  * broadcastable summary the estimate side joins against, exactly how a
  * frequency service would serve it.
  *
  * Structural guarantee: estimates NEVER undercount (each cell sums every
  * colliding key's occurrences, and min preserves that bound); the
  * overestimate is bounded by 2N/w with probability 1 − 2^−d per probe.
  */
object CMSketch {

  /** Portable bucket id for hash row `j`: first 8 md5 hex digits of
    * `"j:key"` as a long, mod `w`. Nonnegative, so `pmod` ≡ `%` in every
    * engine.
    */
  def bucket(j: Int, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(j.toString), lit(":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  private def expand(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    df.select(col(keyCol), explode(array((0 until d).map { j =>
      struct(lit(j).as("j"), bucket(j, col(keyCol), w).as("bucket"))
    }: _*)).as("jb"))
      .select(col(keyCol), col("jb.j").as("j"), col("jb.bucket").as("bucket"))

  /** The sketch table: (j, bucket, cnt), at most `d·w` rows. */
  def build(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"d and w must be positive, got d=$d w=$w")
    expand(df.filter(col(keyCol).isNotNull), keyCol, d, w)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the distinct keys of `probes`: min over the `d`
    * cells each key hashes to. A key absent from the corpus reads 0 only
    * if at least one of its `d` cells is unoccupied (the left join's
    * coalesce); when every cell collides with corpus keys it reads the
    * min colliding count — the classic CM false positive, bounded like
    * any other overestimate.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"d and w must be positive, got d=$d w=$w")
    expand(probes.filter(col(keyCol).isNotNull).select(keyCol).distinct(), keyCol, d, w)
      .join(sketch, Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Equi-join SIZE estimate from two sketches (Cormode & Muthukrishnan
    * §4.2: the CM inner product): per hash row j, Σ_b cntA[j][b]·cntB[j][b]
    * overestimates Σ_k fA(k)·fB(k) = |A ⋈ B| (collisions only ADD cross
    * terms), so min over the d rows keeps the never-undercount guarantee
    * — the optimizer-statistics primitive that sizes a join from two
    * d·w-cell summaries without touching either table. Rows where the
    * sketches share no occupied bucket contribute inner product 0 (the
    * join estimate is then exactly 0), hence the d-row spine rather
    * than a bare groupBy over surviving rows.
    */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame, d: Int): DataFrame = {
    require(d > 0, s"d must be positive, got $d")
    val spark = sketchA.sparkSession
    import spark.implicits._
    val perRow = sketchA.select(col("j"), col("bucket"), col("cnt").as("ca"))
      .join(sketchB.select(col("j"), col("bucket"), col("cnt").as("cb")),
        Seq("j", "bucket"))
      .groupBy(col("j")).agg(sum(col("ca") * col("cb")).as("ip"))
    (0 until d).map(j => j.toLong).toDF("j")
      .join(perRow, Seq("j"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("join_est"))
  }
}
