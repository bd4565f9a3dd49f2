package graft.extensions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Uses the SHARED test session and injects the rule through
  * `spark.experimental.extraOptimizations` (the runtime path; equivalent to
  * `.withExtensions(new GraftExtensions)` at session build — asserted
  * separately). Building a second SparkSession here would silently reuse
  * the shared one (getOrCreate) and stopping it would kill every other
  * suite's context.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def vecs(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 31 + j).toFloat)
      (i.toLong, base)
    }.toDF("id", "v")
  }

  test("similarity theta-join rewrites to LSH bucket equi-join when enabled") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteSimilarityJoin
    spark.conf.set("spark.graft.lsh.rewrite.enabled", "true")
    try {
      val a = vecs(300).select(col("id").as("id_a"), col("v").as("va"))
      val b = vecs(300).select(col("id").as("id_b"), col("v").as("vb"))
      val q = a.crossJoin(b)
        .filter(gfn.cosine_sim(col("va"), col("vb")) >= 0.999)
        .select("id_a", "id_b")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__lsh_bucket"), s"rewrite did not fire:\n$optimized")
      q.collect() // finalize AQE
      val physical = q.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct") && !physical.contains("NestedLoop"),
        s"expected bucketed equi-join, got:\n$physical")
      // identical vectors (same id) always share a bucket -> all self-pairs found
      val pairs = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((1 to 300).forall(i => pairs.contains((i.toLong, i.toLong))))
    } finally {
      spark.conf.set("spark.graft.lsh.rewrite.enabled", "false")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rewrite is opt-in: disabled by default, plan keeps the exact join") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteSimilarityJoin
    try {
      val a = vecs(20).select(col("id").as("id_a"), col("v").as("va"))
      val b = vecs(20).select(col("id").as("id_b"), col("v").as("vb"))
      val q = a.crossJoin(b).filter(gfn.cosine_sim(col("va"), col("vb")) >= 0.999)
      assert(!q.queryExecution.optimizedPlan.toString.contains("__lsh_bucket"))
      assert(q.count() >= 20) // exact path still correct
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions registers against SparkSessionExtensions without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // injectOptimizerRule must accept the rule
  }

  private def bandData() = {
    import spark.implicits._
    // negatives, boundary-adjacent values, duplicates, and nulls
    val xs = Seq[Integer](-7, -7, -3, -1, 0, 1, 4, 9, 12, null)
    val ys = Seq[Integer](-9, -2, -2, 0, 3, 3, 8, 15, null)
    (xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id_a", "x"),
      ys.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id_b", "y"))
  }

  test("band-join rewrite: bucketed equi-join, results identical to the exact plan") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteBandJoin
    try {
      for (w <- Seq(0, 1, 3)) {
        val (a, b) = bandData()
        def q() = a.crossJoin(b).filter(abs(col("x") - col("y")) <= w)
          .select("id_a", "id_b")
        spark.conf.set("spark.graft.band.rewrite.enabled", "true")
        val rewritten = q()
        val opt = rewritten.queryExecution.optimizedPlan.toString
        assert(opt.contains("__band_bucket"), s"w=$w did not rewrite:\n$opt")
        val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        rewritten.collect() // finalize AQE before reading the physical plan
        val phys = rewritten.queryExecution.executedPlan.toString
        assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
          s"w=$w kept the quadratic join:\n$phys")
        spark.conf.set("spark.graft.band.rewrite.enabled", "false")
        val exact = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got == exact, s"w=$w: rewrite changed results")
        assert(exact.nonEmpty) // the equivalence is not vacuous
      }
    } finally {
      spark.conf.set("spark.graft.band.rewrite.enabled", "false")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("band-join rewrite preserves duplicate-row multiset semantics") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteBandJoin
    try {
      import spark.implicits._
      // duplicate rows on both sides: counts must multiply exactly
      val a = Seq(5, 5, 5).toDF("x")
      val b = Seq(6, 6).toDF("y")
      spark.conf.set("spark.graft.band.rewrite.enabled", "true")
      val q = a.crossJoin(b).filter(abs(col("x") - col("y")) <= 1)
      assert(q.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
      assert(q.count() == 6L) // 3 x 2, each pair exactly once
    } finally {
      spark.conf.set("spark.graft.band.rewrite.enabled", "false")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("band-join rewrite leaves non-band and non-int shapes alone") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteBandJoin
    try {
      import spark.implicits._
      spark.conf.set("spark.graft.band.rewrite.enabled", "true")
      // long operands: subtraction could wrap, pigeonhole unsound -> skip
      val al = Seq(1L, 2L).toDF("x"); val bl = Seq(2L, 3L).toDF("y")
      val ql = al.crossJoin(bl).filter(abs(col("x") - col("y")) <= 1L)
      assert(!ql.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
      assert(ql.count() == 3L)
      // same-side band (both refs from one table) must not rewrite
      val ab = Seq((1, 2), (5, 9)).toDF("x", "x2")
      val cd = Seq(7, 8).toDF("z")
      val qs = ab.crossJoin(cd).filter(abs(col("x") - col("x2")) <= 1)
      assert(!qs.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
      assert(qs.count() == 2L)
      // an existing equi-key already makes the join hash-partitionable:
      // replacing it with bucket keys would be a pessimization -> skip
      val ae = Seq((1, 10), (2, 20)).toDF("k", "x")
      val be = Seq((1, 11), (2, 99)).toDF("k2", "y")
      val qe = ae.join(be, col("k") === col("k2"))
        .filter(abs(col("x") - col("y")) <= 1)
      assert(!qe.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
      assert(qe.count() == 1L)
    } finally {
      spark.conf.set("spark.graft.band.rewrite.enabled", "false")
      spark.experimental.extraOptimizations = prev
    }
  }
}
