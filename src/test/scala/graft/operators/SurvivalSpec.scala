package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier replays the textbook life table") {
    // durations: 1(event), 2(event), 2(censored), 3(event)
    // t=1: n=4, d=1 → S=3/4;  t=2: n=3, d=1, c=1 → S=3/4·2/3=1/2
    // t=3: n=1, d=1 → S=0
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("t", "obs")
    val out = Survival.kaplanMeier(df, "t", "obs").orderBy("t").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq === Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 1L, 0.5),
      (3L, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: pure censoring never drops the curve") {
    val df = Seq((1L, false), (2L, false), (3L, false)).toDF("t", "obs")
    val out = Survival.kaplanMeier(df, "t", "obs").orderBy("t").collect()
    assert(out.map(_.getDouble(4)).toSeq === Seq(1.0, 1.0, 1.0))
    // and the at-risk ladder still counts down
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 2L, 1L))
  }

  test("kaplanMeier matches a sequential Scala fold on mixed data") {
    val subjects = Seq(
      (1L, true), (1L, false), (2L, true), (2L, true), (2L, false),
      (4L, false), (5L, true), (5L, true), (7L, false), (7L, true))
    val df = subjects.toDF("t", "obs")
    val out = Survival.kaplanMeier(df, "t", "obs").orderBy("t").collect()
    // reference: group by t ascending, sequential product
    val byT = subjects.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = subjects.size.toLong
    var s = 1.0
    val expect = byT.map { case (t, rows) =>
      val d = rows.count(_._2).toLong
      val c = rows.size - d
      val row = (t, atRisk, d, c, { s = s * (1.0 - d.toDouble / atRisk); s })
      atRisk -= rows.size
      row
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq === expect)
  }
}
