package graft.operators

import graft.SparkSpec

import scala.util.Random

/** KMV set-algebra laws: the merged-pair signature equals the signature
  * computed directly on the unioned element stream (the KMV(A∪B)
  * identity the estimator rests on), exact-mode pairs report exact
  * unions, and estimates are symmetric in the pair order by
  * construction (a < b canonicalization).
  */
class SketchAlgebraSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def elems(rnd: Random, g: String, n: Int, dom: Int): Seq[(String, String)] =
    Seq.fill(n)((g, s"e${rnd.nextInt(dom)}"))

  test("merged-signature union estimate equals the directly-sketched union") {
    val rnd = new Random(3)
    val df = (elems(rnd, "a", 800, 400) ++ elems(rnd, "b", 800, 500))
      .toDF("g", "el")
    val pair = SketchAlgebra.kmvPairwise(df, "g", "el", k = 32).collect()(0)
    // direct sketch of the SAME union stream, exactly: label the whole
    // stream twice (u and v) — merged(u, v) = KMV(S ∪ S) = KMV(S), so
    // est_union(u, v) is the straight single-sketch estimate of the
    // union. The pair's merged-signature estimate must EQUAL it — the
    // KMV(A∪B) set identity, deterministic, no error bound involved.
    val direct = SketchAlgebra.kmvPairwise(
      df.withColumn("g", lit("u"))
        .unionByName(df.withColumn("g", lit("v"))),
      "g", "el", k = 32).collect()(0)
    assert(pair.getAs[Long]("est_union") == direct.getAs[Long]("est_union"))
    assert(direct.getAs[Long]("n_inter") == direct.getAs[Long]("n_union"))
    assert(direct.getAs[Long]("n_common") == 32L) // identical sets: all merged in both
  }

  test("exact mode: pairs with fewer than k distinct elements report exactly") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "y"), ("b", "w"))
      .toDF("g", "el")
    val r = SketchAlgebra.kmvPairwise(df, "g", "el", k = 16).collect()(0)
    assert(r.getAs[Long]("nd_a") == 3L && r.getAs[Long]("nd_b") == 2L)
    assert(r.getAs[Long]("n_inter") == 1L && r.getAs[Long]("n_union") == 4L)
    // merged signature holds the full union: est_union is the exact size
    assert(r.getAs[Long]("est_union") == 4L)
    assert(r.getAs[Boolean]("union_ok") && r.getAs[Boolean]("inter_ok"))
  }

  test("certificates hold across random group collections") {
    val rnd = new Random(17)
    val df = (0 until 6).flatMap(i => elems(rnd, s"g$i", 1200, 600)).toDF("g", "el")
    val rows = SketchAlgebra.kmvPairwise(df, "g", "el", k = 64).collect()
    assert(rows.length == 15)
    assert(rows.forall(_.getAs[Boolean]("union_ok")))
    assert(rows.forall(_.getAs[Boolean]("inter_ok")))
  }
}
