package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune has no false negatives: every true join key survives") {
    val fact = (1L to 5000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val dim = (1L to 5000L by 17).map(k => (k, s"dim$k")).toDF("dk", "attr")
    val bytes = Prune.bloomOfKeys(dim, "dk", expectedKeys = 1000)
    val kept = Prune.bloomPrune(fact, "k", bytes).select("k").as[Long].collect().toSet
    val trueKeys = (1L to 5000L by 17).toSet
    assert(trueKeys.subsetOf(kept), "a true key was pruned — false negative")
    // the sketch must actually prune at 1% fpp on this key density
    assert(kept.size < 5000, "sketch pruned nothing")
  }

  test("bloom-pruned join equals the plain join exactly") {
    val fact = (1L to 3000L).map(k => (k % 500, k)).toDF("k", "v")
    val dim = (0L until 500L by 7).map(k => (k, s"d$k")).toDF("dk", "attr")
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "v", "attr").collect().map(_.toSeq).toSet
    val pruned = Prune.bloomPrunedJoin(fact, dim, "k", "dk", expectedDimKeys = 100)
      .select("k", "v", "attr").collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }

  test("the sketch predicate evaluates below the join exchange") {
    // parquet-backed inputs: local Seq data would let Catalyst constant-fold
    // the foldable bloom predicate into the LocalRelation at plan time
    val fact = graft.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val dim = graft.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000.0d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the regime bloom pruning exists for: neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Prune.bloomPrunedJoin(fact, dim,
        "l_orderkey", "o_orderkey", expectedDimKeys = 10000)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val might = plan.indexOf("might_contain")
      val exch = plan.indexOf("Exchange hashpartitioning")
      assert(might >= 0, s"expected the bloom predicate in the plan:\n$plan")
      assert(exch >= 0, s"expected a shuffle join:\n$plan")
      assert(might > exch,
        s"bloom filter must sit BELOW the exchange (deeper in the printed tree):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("non-integral keys are rejected loudly (build and probe would hash differently)") {
    val strDim = Seq(("a", 1), ("b", 2)).toDF("sk", "x")
    intercept[IllegalArgumentException] { Prune.bloomOfKeys(strDim, "sk", 10) }
    val longDim = Seq((1L, 1)).toDF("dk", "x")
    val bytes = Prune.bloomOfKeys(longDim, "dk", 10)
    intercept[IllegalArgumentException] { Prune.bloomPrune(strDim, "sk", bytes) }
  }

  test("sketch size is bounded driver-side state") {
    val dim = (1L to 10000L).map(k => (k, k)).toDF("dk", "x")
    val bytes = Prune.bloomOfKeys(dim, "dk", expectedKeys = 10000, fpp = 0.01)
    // ~1.2 bytes/key at 1% fpp; well under driver limits at any dim size
    // a sane pipeline would sketch
    assert(bytes.length < 64 * 1024, s"sketch unexpectedly large: ${bytes.length}")
  }
}
