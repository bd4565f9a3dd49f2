package graft.operators

import graft.SparkSpec

/** Integer-JL laws: the plan-baked sign matrix agrees with an
  * independent md5 computation, projection is exactly linear over the
  * integer codes (y(a) − y(b) = y over (qa − qb), the identity the
  * distance certificate rests on), and the distortion certificate holds
  * on the real embeddings at every sf the suite touches.
  */
class RandomProjectionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("sign matrix parity matches an independent md5 derivation") {
    // independent: hex-string md5 via DatatypeConverter-free BigInteger
    def ref(j: Int, i: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(s"$j:$i".getBytes("UTF-8"))
      val first8hex = new java.math.BigInteger(1, dig.take(4)).longValueExact()
      if (first8hex % 2 == 0) 1 else -1
    }
    for (j <- 0 until 16; i <- 0 until 64)
      assert(RandomProjection.sign(j, i) == ref(j, i), s"($j,$i)")
    // and both must agree with the IN-PLAN portable uniform parity
    val keys = (for (j <- 0 until 4; i <- 0 until 8) yield (j, i, s"$j:$i")).toSeq
    val inPlan = keys.toDF("j", "i", "k")
      .select(col("j"), col("i"),
        (Sampling.portableUniform(col("k")) % 2 === 0).as("pos"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getBoolean(2))).toMap
    keys.foreach { case (j, i, _) =>
      assert((RandomProjection.sign(j, i) > 0) == inPlan((j, i)))
    }
  }

  test("projection is linear: y(a) - y(b) equals y applied to (qa - qb)") {
    val rnd = new scala.util.Random(9)
    def vec() = Array.fill(32)((rnd.nextDouble() * 2 - 1).toFloat)
    val df = (0L until 6L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val p = RandomProjection.projectInt8(df, "embedding", m = 8)
      .select(col("vec_id"), col("qvec"), col("yvec")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Int](1).toArray, r.getSeq[Long](2).toArray)).sortBy(_._1)
    val signs = Array.tabulate(8, 32)((j, i) => RandomProjection.sign(j, i))
    for (Seq((_, qa, ya), (_, qb, yb)) <- p.toSeq.combinations(2)) {
      val dq = qa.zip(qb).map { case (x, y) => (x - y).toLong }
      val dy = (0 until 8).map(j =>
        dq.zipWithIndex.map { case (v, i) => signs(j)(i) * v }.sum)
      assert(ya.zip(yb).map { case (x, y) => x - y }.toSeq == dy)
    }
  }

  test("distortion certificate holds on the real embeddings") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = graft.Tables(spark, s"/root/testdata/$sf", "embeddings")
      val bad = RandomProjection
        .distortionPairs(emb, "vec_id", "embedding", m = 16, sampleMax = 20L)
        .filter(!col("jl_ok")).count()
      assert(bad == 0L, s"$sf: $bad pairs outside the [1/5,5] JL band")
    }
  }
}
