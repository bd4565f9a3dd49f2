package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.{functions => gfn}

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
    emb.count() // warm file listing
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val c = emb.filter(col("vec_id") >= 5).select(col("vec_id").as("id"), col("embedding").as("v"))
    val centroids = t("seed") {
      c.orderBy(col("id")).limit(16).select(col("v").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
    }
    println(s"dim=${centroids.head.length} n=${emb.count()}")
    t("lloyd") {
      c.select(gfn.nearest_centroid(col("v"), centroids).as("cid"),
          posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m")).collect()
    }
    t("final") {
      graft.operators.Similarity.ivfTopK(c, emb.filter(col("vec_id") < 5),
        "id", "v", "vec_id", k = 5, nCentroids = 16, nProbe = 4).count()
    }
    spark.stop()
  }
}
