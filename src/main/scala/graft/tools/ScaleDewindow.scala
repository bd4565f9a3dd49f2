package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the three r15 de-windowed conversions in BOTH shapes at
  * growing multiples, checksum-equal before times count (the ScaleAnn
  * discipline, VERDICT r14 #3/#4):
  *
  *   - `ivf`: the IVF serving tail (probe-cell join → cosine →
  *     per-query top-k) as the old per-query `row_number()` window vs
  *     the `bounded_top_k` aggregate now in `Similarity.cosineTopK`.
  *   - `pq`: the PQ-ADC rerank over a synthetic (qid, id, adist)
  *     frame — old window vs the aggregate now in `ProductQuant`.
  *   - `hl`: hodgesLehmann's Walsh-sum median — the old raw-pair
  *     `row_number()` window vs the value-spine lower median now in
  *     `TimeSeries.hodgesLehmann`, at growing day-spans (pair rows
  *     grow quadratically; distinct sums only linearly with the value
  *     range).
  *
  * Usage: `runMain graft.tools.ScaleDewindow [mult ...]`
  * (default 10 100).
  */
object ScaleDewindow {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.expressions.{functions => gfn}
    val k = 10

    // ---- ivf / pq: scored candidate frames at corpus multiples ----
    val emb = graft.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    for (m <- mults) {
      val dir = s"/tmp/graft_scale_ann_$m/embeddings.parquet"
      if (!new java.io.File(dir).exists()) {
        emb.filter(col("vec_id") >= 5)
          .withColumn("__copy", explode(expr(s"sequence(0, ${m - 1})")))
          .withColumn("vec_id", col("vec_id") + col("__copy") * 10000L)
          .drop("__copy")
          .write.mode("overwrite").parquet(dir)
      }
      val corpus = spark.read.parquet(dir)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

      // the cosineTopK input shape: every corpus row scored against
      // every (broadcast) query — the post-probe-join worst case
      def scored = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
        .crossJoin(broadcast(queries))
        .withColumn("cosine", gfn.cosine_sim(col("v"), col("qv")))
        .select(col("query_id"), col("id"), col("cosine"))

      def checksum(r: DataFrame): Long =
        // per-row integerized cosine BEFORE the sum: a double sum is
        // shuffle-order-sensitive at the ulp and would trip the
        // equality require between shapes
        r.agg((sum(col("neighbor_id")) * 1000L + count(lit(1))
          + sum((round(col("cosine"), 6) * 1e6).cast("long")) % 1000000L)
          .cast("long")).collect()(0).getLong(0)

      val wIvf = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("id").asc)
      var a = 0L; var b = 0L
      val tWin = best(3)({ a = checksum(
        scored.withColumn("rank", row_number().over(wIvf))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"))); a })
      val tAgg = best(3)({ b = checksum(
        scored.groupBy(col("query_id"))
          .agg(gfn.bounded_top_k(col("cosine"), col("id"), k, asc = false).as("tk"))
          .select(col("query_id"), explode(col("tk")).as("e"))
          .select(col("query_id"), col("e.id").as("neighbor_id"),
            col("e.score").as("cosine"))); b })
      require(a == b, s"ivf shape disagreement at x$m: $a vs $b")
      println(f"ivf  mult=x$m%-5d window=$tWin%7.2fs  agg=$tAgg%7.2fs  speedup=${tWin / tAgg}%5.2fx")

      // PQ rerank: synthetic integer ADC distances on the same id grid
      def adist = corpus.select(col("vec_id").as("id"))
        .crossJoin(broadcast(queries.select(col("query_id").as("qid"))))
        .withColumn("adist", pmod(xxhash64(col("id"), col("qid")), lit(1000000L)))
      def ckPq(r: DataFrame): Long =
        r.agg((sum(col("id")) * 1000L + sum(col("adist")) % 1000000L
          + count(lit(1))).cast("long")).collect()(0).getLong(0)
      val wPq = Window.partitionBy(col("qid")).orderBy(col("adist"), col("id"))
      var c0 = 0L; var d0 = 0L
      val tPqWin = best(3)({ c0 = ckPq(
        adist.withColumn("__rn", row_number().over(wPq))
          .filter(col("__rn") <= k).select(col("qid"), col("id"), col("adist"))); c0 })
      val tPqAgg = best(3)({ d0 = ckPq(
        adist.groupBy(col("qid"))
          .agg(gfn.bounded_top_k(col("adist"), col("id"), k, asc = true).as("tk"))
          .select(col("qid"), explode(col("tk")).as("e"))
          .select(col("qid"), col("e.id").as("id"),
            col("e.score").cast("long").as("adist"))); d0 })
      require(c0 == d0, s"pq shape disagreement at x$m: $c0 vs $d0")
      println(f"pq   mult=x$m%-5d window=$tPqWin%7.2fs  agg=$tPqAgg%7.2fs  speedup=${tPqWin / tPqAgg}%5.2fx")
    }

    // ---- hl: Walsh-sum median at growing day-span, ONE key (the
    // fat-task worst case the spine shape exists for) ----
    for (dm <- Seq(1, 4, 10, 40, 120)) {
      val days = 30 * dm
      val daily = spark.range(days)
        .select(lit("k").as("event_type"), col("id").as("day"),
          (pmod(xxhash64(col("id")), lit(500L)) + 50L).as("n"))
        .localCheckpoint(true)
      val a0 = daily.select(col("event_type"), col("day").as("__o_a"), col("n").as("__v_a"))
      val b0 = daily.select(col("event_type"), col("day").as("__o_b"), col("n").as("__v_b"))
      def ckHl(r: DataFrame): Long =
        r.agg((sum(col("n_pairs")) * 1000000L + sum(col("hl_x2")))
          .cast("long")).collect()(0).getLong(0)
      // old shape: rank the RAW pair table in one per-key task
      val wHl = Window.partitionBy(col("event_type")).orderBy(col("__s").asc)
      val wcHl = Window.partitionBy(col("event_type"))
      var e0 = 0L; var f0 = 0L
      val tHlWin = best(3)({ e0 = ckHl(
        a0.join(b0, Seq("event_type")).filter(col("__o_a") <= col("__o_b"))
          .select(col("event_type"), (col("__v_a") + col("__v_b")).as("__s"))
          .withColumn("__rn", row_number().over(wHl))
          .withColumn("n_pairs", count(lit(1)).over(wcHl))
          .filter(expr("__rn = (n_pairs + 1) div 2"))
          .select(col("event_type"), col("n_pairs"), col("__s").as("hl_x2"))); e0 })
      val tHlSpine = best(3)({ f0 = ckHl(
        graft.operators.TimeSeries.hodgesLehmann(
          daily, Seq("event_type"), "day", "n")); f0 })
      require(e0 == f0, s"hl shape disagreement at x$dm: $e0 vs $f0")
      println(f"hl   days=$days%-6d window=$tHlWin%7.2fs  spine=$tHlSpine%7.2fs  speedup=${tHlWin / tHlSpine}%5.2fx")
    }
    spark.stop()
  }
}
