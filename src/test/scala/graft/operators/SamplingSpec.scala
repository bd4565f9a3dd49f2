package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedHead keeps exactly min(n, |stratum|) lowest-order rows per stratum") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 9L),
      ("b", 5L), ("b", 4L),
      ("c", 7L)).toDF("g", "id")
    val out = Sampling.stratifiedHead(df, Seq("g"), "id", n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 4L), ("b", 5L), ("c", 7L)))
  }

  test("stratifiedHead plans WindowGroupLimit (per-partition pruning before the shuffle)") {
    val docs = Tables.documents(spark, sf)
    val df = Sampling.stratifiedHead(docs, Seq("lang"), "doc_id", n = 10)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("hashSplit is deterministic across repartitionings and respects weights roughly") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.hashSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2) // same key -> same split, independent of partitioning
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = s1.size.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("val", 0) > 0 && counts.getOrElse("test", 0) > 0)
    // a different seed reshuffles the assignment
    val s3 = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s3 != s1)
  }

  test("portableUniform matches an independent md5 and stays in [0, 2^32)") {
    val keys = Seq(0L, 1L, 42L, 999999L, -17L)
    val got = keys.toDF("k")
      .select(col("k"), Sampling.portableUniform(col("k")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foreach { k =>
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      val expect = java.lang.Long.parseLong(hex, 16)
      assert(got(k) == expect, s"key $k: got ${got(k)}, md5 says $expect")
      assert(got(k) >= 0L && got(k) < (1L << 32))
    }
  }

  test("mixDomains: kept sets grow monotonically with the rate and ~match it") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val kept = (1 to 4).map { k =>
      k -> Sampling.mixDomains(docs, "doc_id", lit(k), rateDen = 4)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    (1 to 3).foreach { k =>
      assert(kept(k).subsetOf(kept(k + 1)),
        s"raising the rate from $k/4 to ${k + 1}/4 must only add rows")
    }
    val n = docs.count().toDouble
    (1 to 3).foreach { k => // rate 4/4 keeps everything exactly; others ±10%
      assert(math.abs(kept(k).size / n - k / 4.0) < 0.1,
        s"rate $k/4 kept ${kept(k).size} of $n")
    }
    assert(kept(4).size.toLong == n.toLong)
  }

  test("tokenBudget: per-domain totals respect the budget and bigger budgets only add") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCountWs(col("text")).as("tok"))
    def kept(b: Long) = Sampling.tokenBudget(docs, "doc_id", "source", "tok", b)
    val small = kept(300L).collect().map(_.getLong(0)).toSet
    val big = kept(600L)
    val totals = big.groupBy("source").agg(sum("tok").as("t"))
      .collect().map(_.getLong(1))
    assert(totals.nonEmpty && totals.forall(_ <= 600L))
    val bigIds = big.collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(bigIds), "raising the budget must only add documents")
    assert(small.size < bigIds.size, "the 300-token budget should bite harder")
  }

  test("tokenBudget drops non-positive token counts (monotonicity guard)") {
    val df = Seq((1L, "a", 10L), (2L, "a", 0L), (3L, "a", -5L), (4L, "a", 10L))
      .toDF("id", "dom", "tok")
    val kept = Sampling.tokenBudget(df, "id", "dom", "tok", budget = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"zero/negative-token rows must be dropped, got $kept")
  }

  test("mixDomains is deterministic across repartitionings and shuffle-free") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val a = Sampling.mixDomains(docs, "doc_id", lit(2), 4)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.mixDomains(docs.repartition(11), "doc_id", lit(2), 4)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val plan = Sampling.mixDomains(docs, "doc_id", lit(2), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"the decision is a projection + filter:\n$plan")
  }
}
