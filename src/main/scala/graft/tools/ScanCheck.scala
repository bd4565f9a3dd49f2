package graft.tools
import org.apache.spark.sql.SparkSession
/** One-off: print each parquet scan's ReadSchema line for a query —
  * the untruncated check behind PlanAudit's regex-based column counts. */
object ScanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    "ReadSchema: struct<[^\n]*".r.findAllIn(plan).foreach(println)
    spark.stop()
  }
}
