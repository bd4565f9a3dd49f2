package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.expressions.{functions => gfn}

/** Own SparkSession (with extensions injected) — separate from the shared
  * test session, torn down after the suite.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def vecs(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 31 + j).toFloat)
      (i.toLong, base)
    }.toDF("id", "v")
  }

  test("similarity theta-join rewrites to LSH bucket equi-join when enabled") {
    spark.sparkContext.setLogLevel("ERROR")
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
    } finally spark.conf.set("spark.graft.lsh.rewrite.enabled", "false")
  }

  test("rewrite is opt-in: disabled by default, plan keeps the exact join") {
    val a = vecs(20).select(col("id").as("id_a"), col("v").as("va"))
    val b = vecs(20).select(col("id").as("id_b"), col("v").as("vb"))
    val q = a.crossJoin(b).filter(gfn.cosine_sim(col("va"), col("vb")) >= 0.999)
    assert(!q.queryExecution.optimizedPlan.toString.contains("__lsh_bucket"))
    assert(q.count() >= 20) // exact path still correct
  }
}
