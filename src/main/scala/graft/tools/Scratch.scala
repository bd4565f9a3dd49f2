package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Contamination

/** Ad-hoc local experimentation entry point (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    for (n <- Seq(2, 3, 5)) {
      val ov = Contamination.overlap(docs.filter(col("doc_id") >= 25), "doc_id", "text",
        docs.filter(col("doc_id") < 25), "text", shingleN = n)
      ov.select(expr("percentile(contamination, array(0.1,0.5,0.9,0.99))").as("p"),
          max(col("contamination")).as("mx"),
          sum(when(col("contamination") >= 0.5, 1).otherwise(0)).as("ge50"),
          sum(when(col("contamination") >= 0.2, 1).otherwise(0)).as("ge20"))
        .show(false)
      println(s"^ shingleN=$n")
    }
    spark.stop()
  }
}
