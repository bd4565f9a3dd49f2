package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the sign-bit ANN Hamming prefilter in BOTH shapes at
  * growing corpus multiples (the ScaleCrossover discipline, VERDICT
  * r13 #2): the r13 per-query `row_number()` window — which
  * repartitions the ENTIRE signature table onto |queries| partitions —
  * against the r14 bounded-heap `BoundedTopKAgg` (map-side partial
  * top-k, |partitions|·|queries| buffer rows on the shuffle).
  *
  * Corpus = sf0.1 embeddings (2 000 rows) id-shifted ×mult; both
  * shapes must agree on (count, Σhamming, Σid) of the candidate set
  * before their times count. Usage:
  * `runMain graft.tools.ScaleAnn [mult ...]` (default 10 100 1000).
  */
object ScaleAnn {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100, 1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val prefilterK = 20

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
      val queries = emb.filter(col("vec_id") < 5)

      // Signatures once per shape run — the production kernel exactly.
      val c = graft.operators.Similarity
        .signSignatures(corpus, "vec_id", "embedding")
      val q = graft.operators.Similarity
        .signSignatures(queries, "vec_id", "embedding")
        .select(col("id").as("query_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
      def ham = c.crossJoin(broadcast(q))
        .withColumn("hamming",
          expr("CAST(bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi) AS BIGINT)"))
        .select(col("query_id"), col("id"), col("hamming"))

      def checksum(cand: DataFrame): Long =
        cand.agg((sum(col("hamming")) * 1000000L + sum(col("id")) % 1000000L
          + count(lit(1))).cast("long")).collect()(0).getLong(0)

      // r13 shape: per-query window over the full signature table
      val wPre = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming").asc, col("id").asc)
      var winSum = 0L
      val tWin = best(3)({
        winSum = checksum(ham.withColumn("__rn", row_number().over(wPre))
          .filter(col("__rn") <= prefilterK)
          .drop("__rn")); winSum })

      // r14 shape: bounded-heap partial top-k aggregate
      var aggSum = 0L
      val tAgg = best(3)({
        aggSum = checksum(ham.groupBy(col("query_id"))
          .agg(graft.expressions.functions
            .bounded_top_k(col("hamming"), col("id"), prefilterK, asc = true)
            .as("tk"))
          .select(col("query_id"), explode(col("tk")).as("e"))
          .select(col("query_id"), col("e.id").as("id"),
            col("e.score").cast("long").as("hamming"))); aggSum })

      require(winSum == aggSum, s"shape disagreement at x$m: $winSum vs $aggSum")
      println(f"mult=x$m%-5d rows=${1995L * m}%9d  window=$tWin%7.2fs  agg=$tAgg%7.2fs  speedup=${tWin / tAgg}%5.2fx")
    }
    spark.stop()
  }
}
