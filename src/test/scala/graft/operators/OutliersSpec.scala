package graft.operators

import graft.SparkSpec

class OutliersSpec extends SparkSpec {

  test("madOutlierStats computes median/MAD as order statistics and flags Hampel outliers") {
    // group g: values 1..9 plus a wild 1000 → n=10 (even), med=(5+6)/2=5.5,
    // adevs = {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5}, sorted middles
    // (2.5, 2.5) → MAD=2.5, cutoff 7.5 → only 1000 is an outlier.
    val rows = (1 to 9).map(i => ("g", i.toLong, i.toDouble)) :+ (("g", 10L, 1000.0))
    val df = spark.createDataFrame(rows).toDF("k", "id", "v")
    val out = Outliers.madOutlierStats(df, Seq("k"), "id", "v").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("med") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("winsorize clamps into the per-group order-statistic tails") {
    // n=10, den=10 → lo_rank=1, hi_rank=10: bounds are min and max (no-op);
    // den=4 → lo_rank=3, hi_rank=8: clamp into [3.0, 8.0]
    val rows = (1 to 10).map(i => ("g", i.toLong, i.toDouble))
    val df = spark.createDataFrame(rows).toDF("k", "id", "v")
    val w4 = Outliers.winsorize(df, Seq("k"), "id", "v", den = 4)
      .orderBy("id").collect().map(_.getAs[Double]("v_w")).toSeq
    assert(w4 === Seq(3.0, 3.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 8.0, 8.0))
    val w10 = Outliers.winsorize(df, Seq("k"), "id", "v", den = 10)
      .orderBy("id").collect().map(_.getAs[Double]("v_w")).toSeq
    assert(w10 === (1 to 10).map(_.toDouble))
  }

  test("winsorize passes null values through and ranks around them") {
    val rows = Seq(("g", 1L, Some(1.0)), ("g", 2L, None), ("g", 3L, Some(100.0)),
      ("g", 4L, Some(2.0)), ("g", 5L, Some(3.0)))
    val df = spark.createDataFrame(rows.map { case (k, id, v) =>
      (k, id, v.map(Double.box).orNull) }).toDF("k", "id", "v")
    val out = Outliers.winsorize(df, Seq("k"), "id", "v", den = 4)
      .orderBy("id").collect().map(r => Option(r.getAs[java.lang.Double]("v_w")))
    assert(out(1) === None)
    // n=4 non-null → lo_rank=1, hi_rank=4: bounds [1.0, 100.0] → no-op here
    assert(out.flatten.map(_.toDouble).toSeq === Seq(1.0, 100.0, 2.0, 3.0))
  }

  test("a null group key forms its own screened group instead of vanishing") {
    val rows = Seq((null.asInstanceOf[String], 1L, 1.0),
      (null.asInstanceOf[String], 2L, 2.0), (null.asInstanceOf[String], 3L, 3.0),
      ("g", 4L, 5.0))
    val df = spark.createDataFrame(rows).toDF("k", "id", "v")
    val out = Outliers.madOutlierStats(df, Seq("k"), "id", "v")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("n")).toMap
    assert(out(None) === 3L)
    assert(out(Some("g")) === 1L)
  }

  test("odd-count groups take the single middle value; nulls are dropped") {
    val rows = Seq(("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("a", 4L, None))
    val df = spark.createDataFrame(
      rows.map { case (k, id, v) => (k, id, v.map(Double.box).orNull) })
      .toDF("k", "id", "v")
    val r = Outliers.madOutlierStats(df, Seq("k"), "id", "v").collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("med") === 20.0)
    assert(r.getAs[Double]("mad") === 10.0)
    assert(r.getAs[Long]("n_outliers") === 0L)
  }
}
