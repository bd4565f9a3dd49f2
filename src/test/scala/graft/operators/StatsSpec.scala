package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("regression recovers an exactly linear relationship") {
    // y = 2x + 1, exactly representable — slope/intercept/corr are exact
    val df = spark.createDataFrame(
      (0 to 10).map(x => ("g", x, 2.0 * x + 1.0))).toDF("k", "x", "y")
    val r = Stats.regression(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("corr") === 1.0)
  }

  test("an anti-correlated group reports corr -1; nulls are dropped") {
    val rows = Seq(("a", 1, Some(3.0)), ("a", 2, Some(2.0)), ("a", 3, Some(1.0)),
      ("a", 4, None))
    val df = spark.createDataFrame(rows.map { case (k, x, y) =>
      (k, x, y.map(Double.box).orNull) }).toDF("k", "x", "y")
    val r = Stats.regression(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("slope") === -1.0)
    assert(r.getAs[Double]("corr") === -1.0)
  }
}
