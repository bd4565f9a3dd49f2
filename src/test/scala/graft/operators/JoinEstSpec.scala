package graft.operators

import graft.SparkSpec

/** CM-sketch join-size estimation laws: never undercounts the exact
  * inner product, exact when collision-free, and zero for disjoint key
  * sets (the d-row-spine case a bare groupBy would get wrong).
  */
class JoinEstSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def exactJoinSize(a: Seq[Long], b: Seq[Long]): Long = {
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.groupBy(identity).view.mapValues(_.size.toLong)
      .map { case (k, fa) => fa * fb.getOrElse(k, 0L) }.sum
  }

  private def estimate(a: Seq[Long], b: Seq[Long], d: Int, w: Int): Long = {
    val sa = CMSketch.build(a.toDF("k"), "k", d, w)
    val sb = CMSketch.build(b.toDF("k"), "k", d, w)
    CMSketch.joinSizeEstimate(sa, sb, d).collect()(0).getLong(0)
  }

  test("never undercounts; exact when width dwarfs the key space") {
    val rnd = new scala.util.Random(41)
    val a = Seq.fill(400)(rnd.nextInt(30).toLong)
    val b = Seq.fill(300)(rnd.nextInt(30).toLong)
    val exact = exactJoinSize(a, b)
    assert(exact > 0)
    // tight sketch: 30 keys in 4096 buckets → collisions vanish
    assert(estimate(a, b, d = 3, w = 4096) == exact)
    // narrow sketch: collisions inflate but never deflate
    assert(estimate(a, b, d = 3, w = 8) >= exact)
  }

  test("disjoint key sets estimate zero (d-row spine, not a bare groupBy)") {
    val a = (0L until 50L).toSeq
    val b = (1000L until 1050L).toSeq
    // w large enough that no cross-collision occurs in ANY row
    assert(estimate(a, b, d = 3, w = 8192) == 0L)
  }
}
