package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the two sweep-style operators: the
  * skyline's running-max decomposition and the interval sweep's +1/-1
  * algebra must match the quadratic definitions they replace, including
  * the duplicate-point and boundary-day edge cases those decompositions
  * can silently get wrong.
  */
class SkylineSweepSpec extends SparkSpec {

  test("skyline2d matches the quadratic dominance definition on sf0.001 parts") {
    val pts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.skyline2d(pts, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).sorted
    val all = pts.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = all.filter { case (_, price, size) =>
      !all.exists { case (_, p2, s2) =>
        p2 <= price && s2 >= size && (p2 < price || s2 > size)
      }
    }.map(_._1).sorted
    assert(got.sameElements(expect), s"skyline mismatch: got ${got.toSeq}")
  }

  test("skyline2d keeps ALL duplicates of a frontier point (equal points never dominate)") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), // duplicate frontier point — both kept
      (3L, 2.0, 10),                // dominated: same size, pricier
      (4L, 2.0, 20), (5L, 3.0, 5)   // 4 on frontier; 5 dominated by 1/2
    ).toDF("id", "price", "size")
    val ids = Skyline.skyline2d(df, "price", "size")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 4L)), s"got ${ids.toSeq}")
  }

  test("intervalConcurrency matches a brute-force recount; half-open end days excluded") {
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("interval 30 days")).as("e"))
    val got = TimeSeries.intervalConcurrency(o, "s", "e")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val ivs = o.select(to_date(col("s")), to_date(col("e"))).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
    got.foreach { case (day, n) =>
      val d = java.time.LocalDate.parse(day)
      val expect = ivs.count { case (s, e) => !d.isBefore(s) && d.isBefore(e) }
      assert(n == expect, s"day $day: swept $n, brute-force $expect")
    }
    // Sanity: concurrency never negative; final change day closes to 0.
    assert(got.values.forall(_ >= 0))
    assert(got.minBy(_._1)._2 > 0)
    assert(got.maxBy(_._1)._2 == 0, "last end day should close every interval")
  }

  test("null criteria are excluded, not frontier-poisoning or count-shifting") {
    import spark.implicits._
    // skyline: a null-price row must neither appear nor dominate
    val sky = Seq((1L, Option.empty[Double], Option(100)),
      (2L, Option(5.0), Option(50)), (3L, Option(4.0), Option.empty[Int]))
      .toDF("id", "price", "size")
    val ids = Skyline.skyline2d(sky, "price", "size")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L), s"got $ids — null rows must drop, (5.0, 50) must survive")

    // sweep: an open-ended (null end) interval is excluded entirely —
    // its +1 must not land either, or every later day over-counts
    val iv = Seq(("2020-01-01", "2020-01-03"), ("2020-01-02", null))
      .toDF("s0", "e0")
      .select(to_date(col("s0")).as("s"), to_date(col("e0")).as("e"))
    val swept = TimeSeries.intervalConcurrency(iv, "s", "e")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(swept == Map("2020-01-01" -> 1L, "2020-01-03" -> 0L), s"got $swept")
  }
}
