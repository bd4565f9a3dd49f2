package graft.tools

import org.apache.spark.sql.SparkSession

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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = graft.SparkEntry.queries("q_asof_join")
    // warmup + 3 timed runs
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $s%.3f s ($n rows)")
    }
    spark.stop()
  }
}
