package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r16 pairwise-battery shape (pairwiseMannWhitney /
  * pairwiseKs): ONE shared densified value spine serving all k²/2
  * group pairs, against the straightforward alternative of running the
  * proven two-sample operator (cliffsDelta — the same per-value +
  * cumulative-window algebra) once per pair. Both are spine-based
  * (neither is a row-pair join — that shape was never on the table);
  * the question the matrix answers is whether k²/2 SEPARATE passes
  * over the corpus beat one pass + a |V|·k² bounded join. Checksums
  * (pair counts p_gt/p_lt) must agree before a timing counts.
  *
  * Usage: `runMain graft.tools.ScalePairwise [mult ...]` (default 1 4 16).
  */
object ScalePairwise {

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Unit): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 5 // bounded group count -> 10 unordered pairs
    val baseRows = 200000L
    println(f"shape: k=$k groups (${k * (k - 1) / 2} pairs); growing rows")
    println(f"${"rows"}%9s ${"matrix_s"}%9s ${"perpair_s"}%10s ${"ratio"}%6s")

    for (m <- mults) {
      val n = baseRows * m
      val df = spark.range(n)
        .select(lit("k").as("key"),
          concat(lit("g"), pmod(col("id"), lit(k.toLong))).as("g"),
          pmod(xxhash64(col("id"), lit(11)), lit(5000L)).as("v"))
        .localCheckpoint(true)

      // checksum equality: the matrix's pair counts vs per-pair cliffsDelta
      val matrix = graft.operators.Stats.pairwiseMannWhitney(df, Seq("key"), "g", "v")
        .select(col("g1"), col("g2"), col("p_gt"), col("p_lt"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val groupNames = (0 until k).map(i => s"g$i")
      for (i <- groupNames.indices; j <- i + 1 until k) {
        val (a, b) = (groupNames(i), groupNames(j))
        val r = graft.operators.Stats.cliffsDelta(
          df.filter(col("g").isin(a, b)).withColumn("in_a", col("g") === a),
          Seq("key"), "in_a", "v").collect().head
        val want = (r.getAs[Long]("p_gt"), r.getAs[Long]("p_lt"))
        require(matrix((a, b)) == want,
          s"pair ($a, $b) mismatch: matrix=${matrix((a, b))} cliffs=$want")
      }

      val tm = best(3)(
        graft.operators.Stats.pairwiseMannWhitney(df, Seq("key"), "g", "v").count())
      val tp = best(3) {
        for (i <- groupNames.indices; j <- i + 1 until k) {
          val (a, b) = (groupNames(i), groupNames(j))
          graft.operators.Stats.cliffsDelta(
            df.filter(col("g").isin(a, b)).withColumn("in_a", col("g") === a),
            Seq("key"), "in_a", "v").count()
          ()
        }
      }
      println(f"$n%9d $tm%9.3f $tp%10.3f ${tp / tm}%6.2f")
    }
    spark.stop()
  }
}
