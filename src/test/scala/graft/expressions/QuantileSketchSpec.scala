package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The quantile sketch's INTERVAL certificate — target ∈
  * [count(< est) − bound, count(≤ est) + bound] — held by construction
  * and falsifiable by test:
  *   1. no compaction (n < k) ⇒ the sketch is EXACT (err = 0, the
  *      target falls INSIDE the chosen value's true-rank interval);
  *   2. the self-tracked bound survives any partitioning (distributed
  *      update/merge == single-stream build on the same data);
  *   3. the certificate holds on adversarial (sorted, reversed,
  *      duplicate-heavy, random) streams far past compaction;
  *   4. ALL-DUPLICATES: the interval form is exact where any point-rank
  *      formulation is unsatisfiable (count(≤ est) = n vs target n/2 —
  *      the review finding that motivated the interval contract);
  *   5. FALSIFIABILITY: tiny-k sketches genuinely err (targets land
  *      outside the TRUE interval, only the bound covers them).
  */
class QuantileSketchSpec extends SparkSpec {

  private def trueLo(data: Seq[Long], v: Long): Long = data.count(_ < v).toLong
  private def trueHi(data: Seq[Long], v: Long): Long = data.count(_ <= v).toLong

  private def buildSketch(k: Int, data: Seq[Long]): QSketch = {
    val s = new QSketch(k)
    data.foreach(s.offer)
    s
  }

  /** Mirror of the aggregate's eval: run-collapsed interval-nearest
    * estimate selection. Returns (target, est, bound) triples.
    */
  private def estimates(s: QSketch, pcts: Seq[Int]): Seq[(Long, Long, Long)] = {
    val (values, weights) = s.sortedItems()
    val bound = 2L * s.err + s.maxWeight
    // collapse duplicate values into runs with [lo, hi] cum intervals
    val runs = {
      val b = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cum = 0L; var i = 0
      while (i < values.length) {
        val v = values(i); var w = 0L
        while (i < values.length && values(i) == v) { w += weights(i); i += 1 }
        b += ((v, cum, cum + w)); cum += w
      }
      b.toSeq
    }
    pcts.map { p =>
      val t = math.max(1L, (p.toLong * s.n + 99L) / 100L)
      var best = runs.headOption.map(_._1).getOrElse(0L)
      var bestDist = Long.MaxValue
      runs.foreach { case (v, lo, hi) =>
        val dist = if (t >= lo && t <= hi) 0L
          else math.min(math.abs(t - lo), math.abs(t - hi))
        if (dist < bestDist) { bestDist = dist; best = v }
      }
      (t, best, bound)
    }
  }

  private def certHolds(data: Seq[Long], t: Long, est: Long, bound: Long): Boolean =
    t >= trueLo(data, est) - bound && t <= trueHi(data, est) + bound

  test("exact below compaction threshold: err 0, target inside the true interval") {
    val data = scala.util.Random.shuffle((1L to 100L).toList)
    val s = buildSketch(256, data)
    assert(s.err == 0L)
    for ((t, est, _) <- estimates(s, Seq(1, 25, 50, 75, 99))) {
      // exact mode: no bound slack needed at all
      assert(t >= trueLo(data, est) && t <= trueHi(data, est),
        s"exact-mode estimate missed: target $t est $est")
    }
  }

  test("certificate holds on adversarial streams far past compaction") {
    val rnd = new scala.util.Random(3)
    val streams = Seq(
      (1L to 20000L).toSeq,                         // sorted
      (1L to 20000L).reverse,                        // reversed
      Seq.fill(20000)(rnd.nextInt(50).toLong),       // duplicate-heavy
      Seq.fill(20000)(rnd.nextLong() % 1000000L))    // random
    for (data <- streams; k <- Seq(32, 256)) {
      val s = buildSketch(k, data)
      for ((t, est, bound) <- estimates(s, Seq(1, 25, 50, 75, 99)))
        assert(certHolds(data, t, est, bound), s"k=$k target=$t est=$est bound=$bound")
    }
  }

  test("all-duplicates: interval certificate exact where point-rank is unsatisfiable") {
    val data = Seq.fill(100)(42L)
    val s = buildSketch(256, data)
    for ((t, est, bound) <- estimates(s, Seq(1, 50, 99))) {
      assert(est == 42L)
      assert(certHolds(data, t, est, bound))
      // the old point-rank claim |count(<=est) - t| <= bound FAILS here
      // for the median — this assertion pins that the interval form is
      // load-bearing, not cosmetic
      if (t == 50L) assert(math.abs(trueHi(data, est) - t) > bound)
    }
  }

  test("merge == single-stream certificate on the same data (any split)") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(9999)(rnd.nextInt(100000).toLong)
    for (cut <- Seq(1, 500, 5000, 9998)) {
      val (a, b) = data.splitAt(cut)
      val merged = buildSketch(64, a)
      merged.mergeIn(buildSketch(64, b))
      assert(merged.n == data.length.toLong)
      for ((t, est, bound) <- estimates(merged, Seq(1, 50, 99)))
        assert(certHolds(data, t, est, bound))
    }
  }

  test("falsifiable: tiny-k sketches really do err (bound is doing work)") {
    val data = (1L to 20000L).toSeq
    val errs = for (p <- Seq(25, 50, 75)) yield {
      val s = buildSketch(8, data)
      val Seq((t, est, bound)) = estimates(s, Seq(p))
      assert(certHolds(data, t, est, bound)) // claim still honored...
      // ...but the target genuinely falls OUTSIDE the true interval
      val outside = t < trueLo(data, est) || t > trueHi(data, est)
      if (outside) math.max(trueLo(data, est) - t, t - trueHi(data, est)) else 0L
    }
    assert(errs.exists(_ > 0L),
      "k=8 over 20k distinct values hit every target exactly — compaction is not compacting")
  }

  test("end-to-end aggregate over a DataFrame honors its own certificate") {
    import spark.implicits._
    import graft.expressions.QuantileSketchAgg.quantile_sketch
    val rnd = new scala.util.Random(5)
    // duplicate-heavy on purpose: the DataFrame path must honor the
    // interval certificate too
    val data = Seq.fill(30000)(rnd.nextInt(500).toLong)
    val row = data.toDF("v").repartition(7)
      .agg(quantile_sketch(col("v"), 128, Seq(10, 50, 90)).as("sk"))
      .select(col("sk.n"), col("sk.bound"), col("sk.targets"), col("sk.ests"))
      .head()
    assert(row.getLong(0) == 30000L)
    val bound = row.getLong(1)
    val targets = row.getSeq[Long](2)
    val ests = row.getSeq[Long](3)
    targets.zip(ests).foreach { case (t, est) =>
      assert(certHolds(data, t, est, bound),
        s"aggregate estimate outside certificate: target $t est $est bound $bound")
    }
  }
}
