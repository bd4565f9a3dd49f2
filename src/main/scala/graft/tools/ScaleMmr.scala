package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r16 MMR re-shape at growing QUERY counts — the axis the
  * r15 verdict flagged: the join-loop rendering (`mmrRerankLoop`,
  * `coalesce(1)` + one single-task job per greedy round) is driver-paced
  * in |queries|, while the `MmrSelectAgg` hash aggregate parallelizes
  * across queries and runs a CONSTANT number of jobs. Per-query
  * candidate count C and k are fixed (the operator's bounded-state
  * contract); only |queries| grows. Checksums must agree before a
  * timing counts (the ScaleAnn discipline).
  *
  * Usage: `runMain graft.tools.ScaleMmr [nQueries ...]`
  * (default 10 100 400).
  */
object ScaleMmr {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val qCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100, 400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (c, k) = (16, 8) // bounded per-query candidates, greedy rounds
    println(f"shape: C=$c candidates/query, k=$k rounds; growing |queries|")
    println(f"${"queries"}%8s ${"agg_s"}%8s ${"loop_s"}%8s ${"loop/agg"}%9s  checksum")

    for (nq <- qCounts) {
      // deterministic synthetic instance (xxhash64 — no Date/random)
      val cands = spark.range(nq.toLong * c)
        .select((col("id") / c).cast("long").as("query_id"),
          pmod(col("id"), lit(c.toLong)).as("id"),
          pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).as("rel"))
        .localCheckpoint(true)
      val pairs = spark.range(nq.toLong * c * c)
        .select((col("id") / (c * c)).cast("long").as("query_id"),
          pmod(col("id") / c, lit(c.toLong)).cast("long").as("id_a"),
          pmod(col("id"), lit(c.toLong)).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
        // symmetric sim: hash of the unordered pair
        .withColumn("sim", pmod(xxhash64(col("query_id"),
          least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b"))),
          lit(1000000L)))
        .localCheckpoint(true)

      def checksum(df: org.apache.spark.sql.DataFrame): String =
        df.select(xxhash64(col("query_id"), col("sel_rank"), col("id"), col("rel"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
          .agg(sum("h")).collect()(0).get(0).toString

      val ca = checksum(graft.operators.Retrieval.mmrRerank(cands, pairs, k))
      val cl = checksum(graft.operators.Retrieval.mmrRerankLoop(cands, pairs, k))
      require(ca == cl, s"checksum mismatch at nq=$nq: agg=$ca loop=$cl")
      // construct INSIDE the timed thunk: the loop's greedy rounds run
      // eagerly at construction (localCheckpoint per round) — timing a
      // pre-built DataFrame would only measure its final join
      val ta = best(3)(graft.operators.Retrieval.mmrRerank(cands, pairs, k).count())
      val tl = best(3)(graft.operators.Retrieval.mmrRerankLoop(cands, pairs, k).count())
      println(f"$nq%8d $ta%8.3f $tl%8.3f ${tl / ta}%9.2f  $ca%s")
    }
    spark.stop()
  }
}
