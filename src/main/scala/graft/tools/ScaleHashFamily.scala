package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×mult scale measurement for the round-12 (hash, id)-shuffle family —
  * novelty, chunk dedup, head dedup, corpus checksum — the ScaleCrossover
  * discipline applied to the new operators: synthesize mult id-shifted
  * copies of the sf0.1 documents table and time each operator at ×1 and
  * ×mult (3 runs, min). Shifted copies are EXACT content duplicates, so
  * the duplication-sensitive outputs legitimately grow (every gram's df
  * multiplies by mult) — the point is that the COST stays near-linear in
  * input rows because every shape is ids-only aggregates, never pair
  * joins on unbounded keys (q_source_leak's pair leg is |sources|²-bounded
  * by construction).
  *
  * Usage: `runMain graft.tools.ScaleHashFamily [mult]` (default 10).
  */
object ScaleHashFamily {
  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args.head.toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(m: Int): DataFrame = {
      if (m == 1) graft.Tables.documents(spark, "/root/testdata/sf0.1")
      else {
        val dir = s"/tmp/graft_scale_docs_$m/documents.parquet"
        if (!new java.io.File(dir).exists()) {
          graft.Tables.documents(spark, "/root/testdata/sf0.1")
            .withColumn("__copy", explode(expr(s"sequence(0, ${m - 1})")))
            .withColumn("doc_id", col("doc_id") + col("__copy") * 10000000L)
            .drop("__copy")
            .write.mode("overwrite").parquet(dir)
        }
        spark.read.parquet(dir)
      }
    }

    import graft.operators.{Dedup, Integrity}
    def chunkDup(d: DataFrame): Long = {
      val ch = d.select(col("doc_id"),
          graft.expressions.functions.ascii_tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 1)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, (size(tk)-1) div 10), " +
            "i -> md5(concat_ws(' ', slice(tk, i*10+1, 10))))")).as("fp"))
      val dfq = ch.select(col("doc_id"), col("fp")).distinct()
        .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("df"))
      ch.join(dfq, Seq("fp")).groupBy(col("doc_id"))
        .agg(sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup")).count()
    }

    Seq(1, mult).foreach { m =>
      val d = docs(m)
      d.count() // warm the input
      val novelty = best(3)(Dedup.noveltyProfile(d, "doc_id", "text", 4).count())
      val chunk = best(3)(chunkDup(d))
      val head = best(3)(Dedup.headDupGroups(d, "doc_id", "text", 8).count())
      val cksum = best(3)(Integrity.corpusChecksum(d, "source", "doc_id", "text").count())
      println(f"mult=$m%-3d novelty=$novelty%6.2f chunk_dedup=$chunk%6.2f " +
        f"head_dedup=$head%6.2f checksum=$cksum%6.2f")
    }
    spark.stop()
  }
}
