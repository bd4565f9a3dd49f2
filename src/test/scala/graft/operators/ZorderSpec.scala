package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {

  test("zvalue2 interleaves bits (a even, b odd)") {
    val df = spark.createDataFrame(Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L)))
      .toDF("a", "b")
    val z = df.select(Layout.zvalue2(col("a"), col("b"))).collect().map(_.getLong(0))
    def ref(a: Long, b: Long): Long = {
      var r = 0L
      for (i <- 0 until 16)
        r |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      r
    }
    assert(z.toSeq === Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L)).map { case (a, b) => ref(a, b) })
    assert(ref(65535L, 65535L) === 0xFFFFFFFFL) // top bit exercises long math
  }

  test("zorderBuckets keeps every bucket containing a box point (soundness, brute force)") {
    val bits = 6
    // coarse grid sweep: every (a,b) inside the box must map to a kept bucket
    val boxes = Seq((1000L, 9000L, 20000L, 30000L), (0L, 65535L, 0L, 0L),
      (40000L, 40001L, 60000L, 65535L))
    for ((aMin, aMax, bMin, bMax) <- boxes) {
      val keep = Layout.zorderBuckets(bits, aMin, aMax, bMin, bMax).toSet
      val pts = for {
        a <- aMin to aMax by math.max(1L, (aMax - aMin) / 17)
        b <- bMin to bMax by math.max(1L, (bMax - bMin) / 17)
      } yield (a, b)
      val df = spark.createDataFrame(pts).toDF("a", "b")
      val buckets = df.select(
        shiftright(Layout.zvalue2(col("a"), col("b")), 32 - bits))
        .collect().map(_.getLong(0)).toSet
      assert(buckets.subsetOf(keep),
        s"box ($aMin,$aMax,$bMin,$bMax): buckets ${buckets -- keep} not kept")
      // and the pruning is real: a small box keeps few of the 64 buckets
      if (aMax - aMin < 10000 && bMax - bMin < 12000)
        assert(keep.size < 64, s"no pruning for box ($aMin,$aMax,$bMin,$bMax)")
    }
  }

  test("q_zorder_scan prunes zbucket directories in the plan") {
    val df = graft.SparkEntry.queries("q_zorder_scan")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("zbucket"),
      s"expected zbucket pruning in PartitionFilters, got '$pf'")
  }
}
