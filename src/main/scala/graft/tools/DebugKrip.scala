package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugKrip {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = args.lift(1).getOrElse("16")
    for (i <- 1 to 4) {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import graft.expressions.{functions => gfn}
      val base = graft.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("source"), gfn.ascii_tokens(col("text")).as("tk"))
        .withColumn("n_tok", size(col("tk")).cast("long"))
        .filter(col("n_tok") > 0)
        .withColumn("n_dis", size(array_distinct(col("tk"))).cast("long"))
      val mx = base
        .select(col("doc_id"), explode(col("tk")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("mx"))
      val j = base.join(mx, Seq("doc_id"))
      val ratings = j.filter(col("n_tok") >= 10)
        .select(col("source"), col("doc_id"),
          col("n_tok").between(20, 90).as("verdict"))
        .unionByName(j.filter(col("n_tok") >= 20)
          .select(col("source"), col("doc_id"),
            (expr("(mx * 1000) div n_tok") < 150).as("verdict")))
        .unionByName(j.filter(col("n_tok") >= 30)
          .select(col("source"), col("doc_id"),
            (expr("(n_dis * 1000) div n_tok") >= 400).as("verdict")))
      val alpha = graft.operators.Stats.krippendorffAlpha(
        ratings, Seq("source"), "doc_id", "verdict").orderBy("source")
      alpha.coalesce(1).write.mode("overwrite").parquet(s"/tmp/debug_krip_out_$i")
      val n = s.read.parquet(s"/tmp/debug_krip_out_$i").count()
      println(s"iter=$i written=$n")
      if (n == 0) {
        val wdf = alpha.coalesce(1)
        wdf.write.mode("overwrite").parquet("/tmp/debug_krip_fail")
        val n2 = s.read.parquet("/tmp/debug_krip_fail").count()
        println(s"  rewrite=$n2")
        if (n2 == 0) {
          println("  collect=" + alpha.collect().length)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get("/tmp/krip_fail_plan.txt"),
            wdf.queryExecution.executedPlan.toString)
          println("  plan dumped")
        }
      }
      s.stop()
    }
  }
}
