package graft.operators

import graft.SparkSpec
import graft.expressions.CurveKernels
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {

  test("xy2d/d2xy are inverse bijections with unit-step adjacency (order 4)") {
    val order = 4
    val n = 1 << order
    val seen = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (x <- 0L until n; y <- 0L until n) {
      // scale order-4 coords into the order-16 domain the kernel fixes:
      // the top 4 levels of the curve are the order-4 curve (prefix
      // property), so d >> 24 is the order-4 index
      val d = CurveKernels.hilbertXY2D(x << 12, y << 12) >> 24
      assert(!seen.contains(d), s"index $d visited twice")
      seen(d) = (x, y)
      assert(CurveKernels.hilbertD2XY(order, d) == (x, y),
        s"d2xy($d) != ($x, $y)")
    }
    assert(seen.size == n * n)
    // THE Hilbert property: consecutive indices are unit Manhattan steps
    // (Morton/Z violates this at every 2^k boundary)
    for (d <- 0L until (n * n - 1L)) {
      val (x1, y1) = seen(d); val (x2, y2) = seen(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
  }

  test("hilbertBuckets keeps every bucket containing a box point (soundness, brute force)") {
    val bits = 6
    val boxes = Seq((1000L, 9000L, 20000L, 30000L), (0L, 65535L, 0L, 0L),
      (40000L, 40001L, 60000L, 65535L))
    for ((aMin, aMax, bMin, bMax) <- boxes) {
      val keep = Layout.hilbertBuckets(bits, aMin, aMax, bMin, bMax).toSet
      val pts = for {
        a <- aMin to aMax by math.max(1L, (aMax - aMin) / 17)
        b <- bMin to bMax by math.max(1L, (bMax - bMin) / 17)
      } yield (a, b)
      val buckets = pts.map { case (a, b) =>
        CurveKernels.hilbertXY2D(a, b) >> (32 - bits)
      }.toSet
      assert(buckets.subsetOf(keep),
        s"box ($aMin,$aMax,$bMin,$bMax): buckets ${buckets -- keep} not kept")
      if (aMax - aMin < 10000 && bMax - bMin < 12000)
        assert(keep.size < 64, s"no pruning for box ($aMin,$aMax,$bMin,$bMax)")
    }
  }

  test("hilbert touches no more buckets than z-order on the graded query box") {
    // the locality claim behind choosing Hilbert, measured on the exact
    // box q_hilbert_scan/q_zorder_scan prune with
    val (aMin, aMax, bMin, bMax) = (100L * 32, 199L * 32, 10L * 2048, 12L * 2048)
    val h = Layout.hilbertBuckets(6, aMin, aMax, bMin, bMax).size
    val z = Layout.zorderBuckets(6, aMin, aMax, bMin, bMax).size
    assert(h <= z, s"hilbert kept $h buckets, z-order $z — locality regressed")
  }

  test("q_hilbert_scan prunes hbucket directories in the plan") {
    val df = graft.SparkEntry.queries("q_hilbert_scan")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("hbucket"),
      s"expected hbucket pruning in PartitionFilters, got '$pf'")
  }
}
