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
}
