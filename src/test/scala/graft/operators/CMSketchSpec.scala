package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CMSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never undercount and are exact without collisions") {
    // 3 keys into a wide sketch (w = 512, d = 3): collision probability
    // is negligible and the estimates must be exactly the counts
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val sketch = CMSketch.build(df, "k", d = 3, w = 512)
    val est = CMSketch.estimate(sketch, df, "k", d = 3, w = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("narrow sketches overestimate but never undercount; absent keys read 0") {
    val n = 500
    val df = (1 to n).map(i => (i % 37).toString).toDF("k")
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w = 8 forces heavy collisions across 37 distinct keys
    val sketch = CMSketch.build(df, "k", d = 3, w = 8)
    val est = CMSketch.estimate(sketch, df, "k", d = 3, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k undercounted: est ${est(k)} < exact $c")
    }
    assert(est.values.sum > exact.values.sum, "w=8 over 37 keys must collide")
    val absent = CMSketch.estimate(sketch, Seq("not-a-key").toDF("k"), "k", d = 3, w = 8)
      .collect()
    assert(absent.length == 1 && absent(0).getLong(1) >= 0L)
  }

  test("the sketch is bounded at d*w cells and the build pre-aggregates before the exchange") {
    val df = (1 to 2000).map(i => i.toString).toDF("k").repartition(4)
    val sketch = CMSketch.build(df, "k", d = 4, w = 16)
    assert(sketch.count() <= 4L * 16L)
    // partial aggregation must appear below the exchange: the shuffle
    // carries cells, not corpus rows
    val plan = sketch.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert("partial".r.findFirstIn(plan.toLowerCase).isDefined,
      s"expected a partial aggregate below the exchange:\n$plan")
  }

  test("sketch is independent of partitioning") {
    val df = (1 to 300).map(i => (i % 11).toString).toDF("k")
    def cells(parts: Int) = CMSketch.build(df.repartition(parts), "k", d = 3, w = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells(1) == cells(7))
  }
}
