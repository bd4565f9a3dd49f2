package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for 100 TB vector corpora: per-vector symmetric
  * int8 quantization (`scale = max|x| / 127`, `q_i = round(x_i / scale)`).
  * 4× smaller than float32 on disk and in shuffle payloads, and the
  * standard first step before IVF/PQ serving indexes.
  *
  * Scale shape: quantization is a narrow `transform` projection (no
  * shuffle); the quantized cosine is exact integer dot products evaluated
  * in double (|q| ≤ 127, dims ≤ thousands ⇒ every intermediate is exactly
  * representable), so the error vs float cosine is purely the rounding the
  * quantizer introduced — which q_embed_quantize certifies against an
  * independent DuckDB recompute.
  */
object Quantize {

  /** Add `qvec` (int8 codes as ints) and `scale` for `vecCol`. All-zero
    * vectors take scale 1 so their code stays all-zero instead of NaN.
    */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    require(!df.columns.contains("scale") && !df.columns.contains("qvec"),
      "int8 writes 'scale' and 'qvec' — the input already carries one of them")
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(maxAbs.isNull || maxAbs === 0.0, lit(1.0))
      .otherwise(maxAbs / lit(127.0))
    df.withColumn("scale", scale)
      .withColumn("qvec",
        transform(v, x => round(x.cast("double") / col("scale")).cast("int")))
  }

  /** Cosine of two int-code vectors, computed in double (exact for int8
    * ranges — every product and partial sum is exactly representable, so
    * accumulation order can't matter). Delegates to the fused codegen
    * CosineSim kernel rather than re-deriving the math with interpreted
    * higher-order lambdas; the kernel's zero-norm → 0 guard applies.
    */
  def intCosine(a: Column, b: Column): Column =
    graft.expressions.functions.cosine_sim(
      a.cast("array<double>"), b.cast("array<double>"))
}
