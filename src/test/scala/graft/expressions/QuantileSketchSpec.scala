package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The quantile sketch's certificate contract, held by construction and
  * falsifiable by test:
  *   1. no compaction (n < k) ⇒ the sketch is EXACT (err = 0, estimate
  *      = the true order statistic);
  *   2. the self-tracked bound survives any partitioning (distributed
  *      update/merge == single-stream build on the same data);
  *   3. |true_rank(est) − target| ≤ bound on adversarial (sorted,
  *      duplicate-heavy, reversed) streams far past compaction;
  *   4. FALSIFIABILITY: the bound is not vacuous — a tiny-k sketch's
  *      actual error is positive (compaction really loses information),
  *      and the claimed bound still covers it.
  */
class QuantileSketchSpec extends SparkSpec {

  private def trueRank(data: Seq[Long], v: Long): Long = data.count(_ <= v).toLong

  private def buildSketch(k: Int, data: Seq[Long]): QSketch = {
    val s = new QSketch(k)
    data.foreach(s.offer)
    s
  }

  private def certificate(k: Int, data: Seq[Long], pcts: Seq[Int]): Seq[(Long, Long, Long)] = {
    val s = buildSketch(k, data)
    val (values, weights) = s.sortedItems()
    val bound = 2L * s.err + s.maxWeight
    pcts.map { p =>
      val t = math.max(1L, (p.toLong * s.n + 99L) / 100L)
      var best = values(0); var bestDist = Long.MaxValue; var cum = 0L
      values.indices.foreach { i =>
        cum += weights(i)
        if (math.abs(cum - t) < bestDist) { bestDist = math.abs(cum - t); best = values(i) }
      }
      (t, trueRank(data, best), bound)
    }
  }

  test("exact below compaction threshold: err 0, estimates are true order stats") {
    val data = scala.util.Random.shuffle((1L to 100L).toList)
    val s = buildSketch(256, data)
    assert(s.err == 0L)
    for ((t, tr, _) <- certificate(256, data, Seq(1, 25, 50, 75, 99)))
      assert(tr == t, s"exact-mode estimate missed: target $t true-rank $tr")
  }

  test("bound holds on adversarial streams far past compaction") {
    val rnd = new scala.util.Random(3)
    val streams = Seq(
      (1L to 20000L).toSeq,                         // sorted
      (1L to 20000L).reverse,                        // reversed
      Seq.fill(20000)(rnd.nextInt(50).toLong),       // duplicate-heavy
      Seq.fill(20000)(rnd.nextLong() % 1000000L))    // random
    for (data <- streams; k <- Seq(32, 256)) {
      for ((t, tr, bound) <- certificate(k, data, Seq(1, 25, 50, 75, 99)))
        assert(math.abs(tr - t) <= bound,
          s"k=$k: |${tr} - $t| > $bound")
    }
  }

  test("merge == single-stream on the same data (any split)") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(9999)(rnd.nextInt(100000).toLong)
    for (cut <- Seq(1, 500, 5000, 9998)) {
      val (a, b) = data.splitAt(cut)
      val merged = buildSketch(64, a)
      merged.mergeIn(buildSketch(64, b))
      // the merged sketch must satisfy ITS OWN certificate
      val (values, weights) = merged.sortedItems()
      assert(merged.n == data.length.toLong)
      val bound = 2L * merged.err + merged.maxWeight
      for (p <- Seq(1, 50, 99)) {
        val t = math.max(1L, (p.toLong * merged.n + 99L) / 100L)
        var best = values(0); var bestDist = Long.MaxValue; var cum = 0L
        values.indices.foreach { i =>
          cum += weights(i)
          if (math.abs(cum - t) < bestDist) { bestDist = math.abs(cum - t); best = values(i) }
        }
        assert(math.abs(trueRank(data, best) - t) <= bound)
      }
    }
  }

  test("falsifiable: tiny-k sketches really do err (bound is doing work)") {
    val data = (1L to 20000L).toSeq
    val errs = for (p <- Seq(25, 50, 75)) yield {
      val Seq((t, tr, bound)) = certificate(8, data, Seq(p))
      assert(math.abs(tr - t) <= bound) // claim still honored...
      math.abs(tr - t)
    }
    assert(errs.exists(_ > 0L), // ...but the estimate is genuinely lossy
      "k=8 over 20k sorted values produced exact ranks — compaction is not compacting")
  }

  test("end-to-end aggregate over a DataFrame matches the in-memory model") {
    import spark.implicits._
    import graft.expressions.QuantileSketchAgg.quantile_sketch
    val rnd = new scala.util.Random(5)
    val data = Seq.fill(30000)(rnd.nextInt(1000000).toLong)
    val row = data.toDF("v").repartition(7)
      .agg(quantile_sketch(col("v"), 128, Seq(10, 50, 90)).as("sk"))
      .select(col("sk.n"), col("sk.bound"), col("sk.targets"), col("sk.ests"))
      .head()
    assert(row.getLong(0) == 30000L)
    val bound = row.getLong(1)
    val targets = row.getSeq[Long](2)
    val ests = row.getSeq[Long](3)
    targets.zip(ests).foreach { case (t, est) =>
      assert(math.abs(trueRank(data, est) - t) <= bound,
        s"aggregate estimate outside its own bound: target $t est $est bound $bound")
    }
  }
}
