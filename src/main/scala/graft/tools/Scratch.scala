package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Ad-hoc local experimentation entry point (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val t0 = System.nanoTime()
    val res = Similarity.ivfTopK(emb.filter(col("vec_id") >= 5), queries,
      "vec_id", "embedding", "vec_id", k = 5, nCentroids = 16, nProbe = 4)
      .orderBy("query_id", "rank")
    val n = res.collect().length
    println(s"ROWS=$n TIME=${(System.nanoTime() - t0) / 1e9}")
    res.explain("formatted")
    spark.stop()
  }
}
