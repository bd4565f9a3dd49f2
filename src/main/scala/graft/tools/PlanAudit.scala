package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Scale audit: one line per query summarizing the physical plan's
  * scale-relevant properties — exchange (shuffle) count, join strategies,
  * scan column width, filter pushdown, cartesian products. Run at sf0.01:
  *
  *   sbt "runMain graft.tools.PlanAudit" > PLAN_AUDIT.txt
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // optional trailing args: audit only these query names (builder-side
    // iteration on a single plan; the driver runs the full inventory)
    val only = args.drop(1).toSet

    println(f"${"query"}%-24s ${"exch"}%5s ${"bhj"}%4s ${"smj"}%4s ${"bnl"}%4s ${"cart"}%5s ${"scans(cols)"}%-18s pushed  notes")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only.contains(kv._1))
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val qe: QueryExecution = df.queryExecution
        df.collect() // materialize THIS QueryExecution so AQE finalizes it
        val plan = qe.executedPlan.toString
        def count(s: String) = s.r.findAllIn(plan).length
        val exch = count("Exchange ")
        val bhj = count("BroadcastHashJoin")
        val smj = count("SortMergeJoin")
        val bnl = count("BroadcastNestedLoopJoin")
        val cart = count("CartesianProduct")
        // stop at end-of-line as well as '>': the plan string truncates
        // long schemas ("...") without a closing '>', and an unanchored
        // scan would swallow the NEXT scan's schema into one count
        val scanCols = "ReadSchema: struct<([^>\n]*)".r.findAllMatchIn(plan)
          .map(_.group(1).count(_ == ':')).toSeq
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
        // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
        val codegenOps = count("\\*\\(")
        val flag = if (codegenOps == 0) "NO-CODEGEN" else s"wsc=$codegenOps"
        println(f"$name%-24s $exch%5d $bhj%4d $smj%4d $bnl%4d $cart%5d ${scanCols.mkString("[", ",", "]")}%-18s $pushed%6d  $flag")
      } catch {
        case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
