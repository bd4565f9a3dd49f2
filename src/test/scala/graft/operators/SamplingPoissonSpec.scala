package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Sampling.poissonWeight]]'s contract: deterministic per key,
  * range [0, 8] (the documented truncation), replicate-independent
  * draws, and a Poisson(1)-shaped empirical distribution — mean within
  * ~4σ of 1 and a zero-fraction near e^-1 over 20k draws, loose enough
  * to never flake, tight enough that a broken threshold table fails.
  */
class SamplingPoissonSpec extends SparkSpec {

  test("deterministic, bounded, Poisson(1)-shaped over 20k keys") {
    import spark.implicits._
    val df = (0 until 20000).map(i => s"key:$i").toDF("k")
      .withColumn("w", Sampling.poissonWeight(col("k")))
    val again = (0 until 20000).map(i => s"key:$i").toDF("k")
      .withColumn("w", Sampling.poissonWeight(col("k")))
    val ws = df.orderBy("k").select("w").collect().map(_.getLong(0))
    val ws2 = again.orderBy("k").select("w").collect().map(_.getLong(0))
    assert(ws.toSeq == ws2.toSeq) // bit-identical replay
    assert(ws.forall(w => w >= 0L && w <= 8L))
    val mean = ws.sum.toDouble / ws.length
    assert(math.abs(mean - 1.0) < 0.03, s"mean $mean") // σ/√n ≈ 0.007
    val zeroFrac = ws.count(_ == 0L).toDouble / ws.length
    assert(math.abs(zeroFrac - math.exp(-1)) < 0.02, s"P(0) $zeroFrac")
  }

  test("replicates draw independently for the same base key") {
    import spark.implicits._
    val df = (for (i <- 0 until 200; r <- 0 until 10) yield (s"k$i", r))
      .toDF("k", "rep")
      .withColumn("w", Sampling.poissonWeight(concat_ws(":", col("k"), col("rep"))))
    // across replicates of one key the weights must vary (a constant
    // per-key weight would make the bootstrap replicates identical)
    val distinctPerKey = df.groupBy("k").agg(countDistinct(col("w")).as("d"))
      .agg(max(col("d"))).collect()(0).getLong(0)
    assert(distinctPerKey >= 2L)
  }
}
