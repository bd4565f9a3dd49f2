package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a ±1 sign matrix
  * (Achlioptas 2003: database-friendly random projections — public), in
  * EXACT INTEGER arithmetic end to end: vectors are first int8-quantized
  * ([[Quantize.int8]]), the sign matrix entries come from the portable
  * md5 parity of the literal key `"j:i"`, and every projected coordinate
  * y_j = Σ_i s_ji·q_i is a bounded BIGINT sum — so any engine with md5
  * rebuilds the whole projection bit-identically (the repo's no-float-
  * randomness discipline applied to dimensionality reduction).
  *
  * The JL guarantee E‖y_a−y_b‖² = m·‖q_a−q_b‖² is certified on sampled
  * pairs by the integer cross-multiplication band
  * m·d²_orig/5 ≤ d²_proj ≤ 5·m·d²_orig — measured 0.24–1.84 of the
  * m-normalized ratio across the sf corpora at m = 16, so the pinned
  * [1/5, 5] band is falsifiable but held with margin (data-dependent
  * constant: re-pin, don't debug, if the generator changes).
  *
  * Scale shape: the sign matrix is m·d literals baked into the plan
  * (computed once, driver-side — no per-row hashing), the projection is
  * a narrow codegen projection (flat per-output-dim sums — the
  * CollapseProject-safe rendering, see PrefixSum.bucketCount), and
  * nothing shuffles until a consumer aggregates; reducing 64 → 16 dims
  * cuts downstream ANN/dedup shuffle payloads 4× before any index even
  * enters the picture.
  */
object RandomProjection {

  /** ±1 from the SAME md5-prefix parity [[Sampling.portableUniform]]
    * computes in-plan: first 8 hex chars of md5("j:i") as a long, bit 0
    * decides the sign. Driver-side because the matrix is m·d literals —
    * the oracle derives each entry in SQL from the identical formula.
    */
  def sign(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    if ((java.lang.Long.parseLong(hex, 16) % 2L) == 0L) 1 else -1
  }

  /** Adds `qvec` + `scale` (from [[Quantize.int8]]) and the m-dim
    * integer projection `yvec: array<long>`.
    *
    * The vector dimension is taken from `dim` when supplied (skips the
    * validation pass — use at scale when the schema is known); otherwise
    * it is derived by a single narrow min/max-size aggregate that also
    * REJECTS empty and ragged inputs — a ragged corpus would otherwise
    * silently project nulls into the BIGINT sums.
    */
  def projectInt8(df: DataFrame, vecCol: String, m: Int = 16, dim: Int = -1): DataFrame = {
    require(m >= 1 && m <= 256, s"m out of range: $m")
    val d =
      if (dim > 0) dim
      else {
        val dims = df.agg(min(size(col(vecCol))).as("lo"),
          max(size(col(vecCol))).as("hi")).head()
        require(!dims.isNullAt(0), s"projectInt8: empty input, cannot derive dim of '$vecCol'")
        val (lo, hi) = (dims.getInt(0), dims.getInt(1))
        require(lo == hi, s"projectInt8: ragged '$vecCol' dims [$lo, $hi]; pass dim explicitly")
        require(lo >= 1, s"projectInt8: zero-length vectors in '$vecCol'")
        lo
      }
    val q = Quantize.int8(df, vecCol)
    def y(j: Int): Column =
      (0 until d).map { i =>
        val s = sign(j, i)
        val term = element_at(col("qvec"), i + 1).cast("long")
        if (s > 0) term else -term
      }.reduce(_ + _)
    q.withColumn("yvec", array((0 until m).map(y): _*))
  }

  /** Distortion audit over all pairs of the first `sampleMax` ids:
    * exact integer squared distances in original-quantized and
    * projected space plus the pinned [1/5, 5] JL band certificate.
    */
  def distortionPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 16,
      sampleMax: Long = 20L): DataFrame = {
    val p = projectInt8(df.filter(col(idCol) < sampleMax), vecCol, m)
      .select(col(idCol).as("id"), col("qvec"), col("yvec"))
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x.cast("long") - y.cast("long")) *
        (x.cast("long") - y.cast("long"))), lit(0L), (acc, v) => acc + v)
    p.select(col("id").as("id_a"), col("qvec").as("qa"), col("yvec").as("ya"))
      .join(p.select(col("id").as("id_b"), col("qvec").as("qb"), col("yvec").as("yb")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        d2(col("qa"), col("qb")).as("d2_orig"),
        d2(col("ya"), col("yb")).as("d2_proj"))
      .withColumn("jl_ok",
        col("d2_proj") * 5 >= col("d2_orig") * m &&
          col("d2_proj") <= col("d2_orig") * (5L * m))
  }
}
