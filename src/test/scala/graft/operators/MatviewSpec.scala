package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatviewSpec extends SparkSpec {

  private lazy val rows = spark.createDataFrame(
    (1 to 100).map(i => (i % 7L, i, i * 0.25))).toDF("k", "id", "v")

  private def viewOf(splits: Seq[Int]): Array[(Long, Long, Double, Double)] = {
    // fold deltas split at the given id boundaries
    val bounds = (0 +: splits) :+ 101
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      rows.filter(col("id") >= lo && col("id") < hi)
    }.toSeq
    val state = batches.tail.foldLeft(
      Matview.partial(batches.head, Seq("k"), "v")) { (st, delta) =>
      Matview.refresh(st, delta, Seq("k"), "v")
    }
    Matview.read(state, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
  }

  test("incremental refreshes equal the one-shot aggregate for any batch split") {
    val full = viewOf(Seq.empty)
    assert(viewOf(Seq(50)) === full)
    assert(viewOf(Seq(20, 40, 60, 80)) === full)
    assert(viewOf(Seq(1, 2, 3)) === full) // tiny + huge deltas
  }

  test("the state is additive: n and total match direct computation") {
    val full = viewOf(Seq(33, 66)).map(t => t._1 -> ((t._2, t._3))).toMap
    val direct = rows.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(full === direct)
  }

  test("refreshJoin's delta algebra equals the one-shot join exactly") {
    import spark.implicits._
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (2L, "a2bis"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (4L, "b4")).toDF("k", "bv")
    val da = Seq((2L, "a2new"), (4L, "a4new")).toDF("k", "av")
    val db = Seq((2L, "b2new"), (3L, "b3new")).toDF("k", "bv")
    val v0 = a.join(b, Seq("k"))
    val got = Matview.refreshJoin(v0, a, da, b, db, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val want = a.unionByName(da).join(b.unionByName(db), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    // every pair class exercised: ΔA⋈B (4,b4), A⋈ΔB (3,b3new; a2bis
    // dupes), ΔA⋈ΔB (2-new pairs), standing V (1, 2 originals)
    assert(got === want)
    assert(got.contains((4L, "a4new", "b4")) &&
      got.contains((3L, "a3", "b3new")) &&
      got.contains((2L, "a2new", "b2new")))
  }
}
