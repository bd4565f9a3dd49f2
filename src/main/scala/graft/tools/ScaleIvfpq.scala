package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures IVF-PQ SERVING against the full-PQ scan at corpus
  * multiples — training shared via the pretrained hook so only the
  * serving topologies differ: the full ADC touches every code row,
  * the hybrid only the probed `nProbe/nCentroids` fraction. Both
  * shapes' results are checksum-compared on the OVERLAP (hybrid adist
  * must be bit-equal to full adist for shared ids — the q_ann_ivfpq
  * certificate's invariant) before times count.
  *
  * Usage: `runMain graft.tools.ScaleIvfpq [mult ...]` (default 20 100).
  */
object ScaleIvfpq {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val toInt = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 256) AS BIGINT) + 512)"

    for (m <- mults) {
      val dir = s"/tmp/graft_scale_ann_$m/embeddings.parquet"
      if (!new java.io.File(dir).exists()) {
        emb.filter(col("vec_id") >= 5)
          .withColumn("__copy", explode(expr(s"sequence(0, ${m - 1})")))
          .withColumn("vec_id", col("vec_id") + col("__copy") * 10000L)
          .drop("__copy")
          .write.mode("overwrite").parquet(dir)
      }
      val corpus = spark.read.parquet(dir)
        .select(col("vec_id"), col("embedding"), expr(toInt).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"), expr(toInt).as("v"))

      // one training, pinned — serving is the only difference measured
      val (codes, cents) = graft.operators.ProductQuant.trainEncode(
        corpus, "vec_id", "v", nSub = 4, subDim = 16, kCode = 4, rounds = 2)
      val codesP = codes.localCheckpoint(true)
      val centsP = cents.localCheckpoint(true)

      def ck(r: DataFrame): Long =
        r.agg((sum(col("id")) * 1000L + sum(col("adist")) % 1000000L
          + count(lit(1))).cast("long")).collect()(0).getLong(0)

      var full: Map[(Long, Long), Long] = Map.empty
      val tFull = best(3)({
        val rows = graft.operators.ProductQuant.adcServe(
          codesP, centsP, queries, "vec_id", "v",
          nSub = 4, subDim = 16, kCode = 4, topK = 10).collect()
        full = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        full.size.toLong
      })
      var hybrid: Map[(Long, Long), Long] = Map.empty
      val tHyb = best(3)({
        val rows = graft.operators.ProductQuant.ivfpqTopK(
          corpus, queries, "vec_id", "vec_id", "embedding", "v",
          k = 10, nCentroids = 16, nProbe = 4,
          nSub = 4, subDim = 16, kCode = 4, rounds = 2,
          pretrainedPq = Some((codesP, centsP))).collect()
        hybrid = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        hybrid.size.toLong
      })
      val overlap = hybrid.keySet intersect full.keySet
      require(overlap.forall(k0 => hybrid(k0) == full(k0)),
        s"adist disagreement on the overlap at x$m")
      println(f"ivfpq mult=x$m%-5d rows=${1995L * m}%9d  fullADC=$tFull%7.2fs  " +
        f"adhocHybrid(nProbe=4/16)=$tHyb%7.2fs  speedup=${tFull / tHyb}%5.2fx  " +
        f"overlap=${overlap.size}/${full.size}")

      // the WRITE-ONCE form: codes persisted partitionBy(cid), queries
      // prune partitions — no training, no corpus join in the serve
      val idxDir = s"/tmp/graft_scale_ivfpq_$m"
      if (!new java.io.File(s"$idxDir/model.json").exists()) {
        graft.operators.ProductQuant.writeIvfpqIndex(corpus,
          "vec_id", "embedding", "v", idxDir,
          nCentroids = 16, nSub = 4, subDim = 16, kCode = 4, rounds = 2)
      }
      // full scan over the SAME persisted codes — the fair I/O baseline
      val persisted = spark.read.parquet(s"$idxDir/codes")
      val cbooks = spark.read.parquet(s"$idxDir/codebooks")
      val tFullIdx = best(3)(ck(graft.operators.ProductQuant.adcServe(
        persisted, cbooks, queries, "vec_id", "v",
        nSub = 4, subDim = 16, kCode = 4, topK = 10)))
      val tIdx = best(3)(ck(graft.operators.ProductQuant.queryIvfpqIndex(
        spark, idxDir, queries, "vec_id", "embedding", "v",
        k = 10, nProbe = 4, nSub = 4, subDim = 16, kCode = 4)))
      println(f"ivfpq mult=x$m%-5d INDEXED: fullCodesScan=$tFullIdx%7.2fs  " +
        f"prunedServe(nProbe=4/16)=$tIdx%7.2fs  speedup=${tFullIdx / tIdx}%5.2fx")
    }
    spark.stop()
  }
}
