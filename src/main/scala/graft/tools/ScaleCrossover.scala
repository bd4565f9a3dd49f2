package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the single-partition-window shape AGAINST the distributed
  * prefix-sum shape at growing scale factors — turning "the de-windowed
  * conversions are right at 100×" from an argument into numbers
  * (VERDICT r10 #5). The driver ships sf0.001–0.1 only, so larger
  * inputs are synthesized locally: `mult` id-shifted copies of the
  * sf0.1 tables under /tmp/graft_scale_<mult>/ (content untouched —
  * the window-vs-prefix cost is a function of row volume and key
  * cardinality, both of which the shift preserves ×mult).
  *
  * Three operators, both shapes each, 3 runs (min reported):
  *   - vocab growth  (global running totals over the doc spine)
  *   - skyline       (exclusive running max over distinct prices)
  *   - sorted-nbhd   (global dense rank over the name sort)
  *
  * Usage: `runMain graft.tools.ScaleCrossover [mult ...]` (default 1 10 50).
  */
object ScaleCrossover {

  private def timeIt(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def best(runs: Int)(f: => Long): Double =
    (1 to runs).map(_ => timeIt(f)).min

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def scaled(name: String, idCol: String, mult: Int, shift: Long): DataFrame = {
      if (mult == 1) graft.Tables(spark, sf, name)
      else {
        val dir = s"/tmp/graft_scale_$mult/$name.parquet"
        if (!new java.io.File(dir).exists()) {
          val base = graft.Tables(spark, sf, name)
          base.withColumn("__copy", explode(expr(s"sequence(0, ${mult - 1})")))
            .withColumn(idCol, col(idCol) + col("__copy") * shift)
            .drop("__copy")
            .write.mode("overwrite").parquet(dir)
        }
        spark.read.parquet(dir)
      }
    }

    for (m <- mults) {
      val docs = scaled("documents", "doc_id", m, 1000000L)
      val parts = scaled("part", "p_partkey", m, 10000000L)

      // --- vocab growth: per-doc token/new-type spine, then cumsum ---
      val toks = docs.select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("tok"))
      val perDoc = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
      val firsts = toks.groupBy(col("tok")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("new_types"))
      val spine = perDoc.join(firsts, Seq("doc_id"), "left")
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .localCheckpoint(true)
      val wG = Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // consume the cum columns by COLLECTING their max — a bare count()
      // (even over .agg) lets Catalyst prune the window/cumsum expression
      // and times an empty plan instead of the shape under test
      var vgWinMax = 0L
      var vgPfxMax = 0L
      val vgWin = best(3)({
        vgWinMax = spine
          .select(sum(col("n_tokens")).over(wG).as("ct"),
            sum(col("new_types")).over(wG).as("cv"))
          .agg(max(col("ct"))).collect()(0).getLong(0); vgWinMax })
      val vgPfx = best(3)({
        vgPfxMax = graft.operators.PrefixSum
          .runningTotals(spine, "doc_id", Seq("n_tokens", "new_types"), 8)
          .agg(max(col("cum_n_tokens"))).collect()(0).getLong(0); vgPfxMax })
      require(vgWinMax == vgPfxMax, s"vocab shape disagreement: $vgWinMax vs $vgPfxMax")

      // --- skyline: exclusive running max over distinct prices ---
      val pts = parts.select("p_partkey", "p_retailprice", "p_size")
        .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      def skylineFrom(pref: DataFrame): Long =
        pts.join(pref, Seq("p_retailprice"))
          .filter(!(coalesce(col("__amax") >= col("p_size"), lit(false)) ||
            col("__gmax") > col("p_size"))).count()
      def perMin = pts.groupBy(col("p_retailprice")).agg(max(col("p_size")).as("__gmax"))
      val wEx = Window.orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val skWin = best(3)(skylineFrom(
        perMin.withColumn("__amax", max(col("__gmax")).over(wEx))))
      val skPfx = best(3)(skylineFrom(graft.operators.PrefixSum
        .runningMax(perMin, "p_retailprice", "__gmax", 8, exclusive = true)
        .withColumnRenamed("runmax___gmax", "__amax")))

      // --- sorted-neighborhood: global rank then neighbor pairs ---
      def nbhdPairs(ranked: DataFrame): Long = {
        val a = ranked.select(col("rnk").as("rnk_a"), col("id").as("id_a"),
            col("key").as("ka"))
          .withColumn("k", explode(expr("sequence(1L, 3L)")))
          .withColumn("rnk_b", col("rnk_a") + col("k"))
        val b = ranked.select(col("rnk").as("rnk_b"), col("id").as("id_b"),
          col("key").as("kb"))
        a.join(b, Seq("rnk_b"))
          .filter(levenshtein(col("ka"), col("kb")) <= 2).count()
      }
      val baseNb = parts.select(col("p_partkey").cast("long").as("id"),
        col("p_name").as("key"))
      val snWin = best(3)(nbhdPairs(baseNb.withColumn("rnk",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))))
      val snPfx = best(3)(graft.operators.Dedup
        .sortedNeighborhood(parts, "p_partkey", "p_name", 3, 2, 8).count())

      println(f"mult=$m%-4d vocab_win=$vgWin%.2f vocab_pfx=$vgPfx%.2f " +
        f"skyline_win=$skWin%.2f skyline_pfx=$skPfx%.2f " +
        f"nbhd_win=$snWin%.2f nbhd_pfx=$snPfx%.2f")
    }

    // Primitive-level sweep: the two shapes over a bare N-row spine —
    // isolates the crossover row count from any operator's upstream
    // cost. The spine is pinned first so both time ONLY the cumsum.
    for (n <- Seq(1000000L, 10000000L, 40000000L)) {
      val spine = spark.range(n).select(col("id").as("k"),
        (col("id") % 97).as("x")).localCheckpoint(true)
      val w = Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      var winMax = 0L
      var pfxMax = 0L
      val tWin = best(3)({
        winMax = spine.select(sum(col("x")).over(w).as("c"))
          .agg(max(col("c"))).collect()(0).getLong(0); winMax })
      val tPfx = best(3)({
        pfxMax = graft.operators.PrefixSum
          .runningTotals(spine, "k", Seq("x"), 32)
          .agg(max(col("cum_x"))).collect()(0).getLong(0); pfxMax })
      require(winMax == pfxMax, s"shape disagreement: $winMax vs $pfxMax")
      println(f"spine_rows=$n%-9d win=$tWin%.2f pfx=$tPfx%.2f total=$winMax")
    }
    spark.stop()
  }
}
