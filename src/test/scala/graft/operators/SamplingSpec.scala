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

  test("isqrt is exact on perfect squares, off-by-one neighbors, and the 2^62 domain edge") {
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 24L, 25L, 26L,
      (1L << 31) * (1L << 31) - 1L, (1L << 31) * (1L << 31),
      (1L << 62) - 1L) // domain edge: floor(sqrt) = 2^31 - 1
    val got = cases.toDF("x")
      .select(col("x"), Sampling.isqrt(col("x")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { x =>
      val r = BigInt(got(x))
      assert(r * r <= x && (r + 1) * (r + 1) > x,
        s"isqrt($x) = $r is not the floor square root")
    }
  }

  test("temperatureMix: Hamilton targets sum to totalRows, obey the cap, and draws are monotone") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "source", "doc_id", totalRows = 130L)
    val rows = out.select("doc_id", "source", "cnt", "w", "target").collect()
    assert(rows.length == 130,
      s"no domain cap binds at sf0.001 → the apportionment must land exactly, got ${rows.length}")
    // per-domain kept counts equal the published target
    val perDomain = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val targets = rows.map(r => r.getString(1) -> r.getLong(4)).toMap
    perDomain.foreach { case (dom, n) =>
      assert(n.toLong == targets(dom), s"domain $dom kept $n != target ${targets(dom)}")
      assert(targets(dom) <= rows.find(_.getString(1) == dom).get.getLong(2),
        s"domain $dom target exceeds its population")
    }
    // Within a domain the draw is a priority prefix: whenever a domain's
    // target is no smaller in the bigger draw, its kept set must be a
    // superset. (Hamilton apportionment is NOT house-monotone — the
    // Alabama paradox — so the per-domain guard is the honest property,
    // not a global subset claim.)
    val small = Sampling.temperatureMix(docs, "source", "doc_id", totalRows = 60L)
      .select("source", "doc_id", "target").collect()
    val smallByDom = small.groupBy(_.getString(0))
    val bigByDom = rows.groupBy(_.getString(1))
    smallByDom.foreach { case (dom, srows) =>
      val sTarget = srows.head.getLong(2)
      val bTarget = targets(dom)
      if (bTarget >= sTarget) {
        val sIds = srows.map(_.getLong(1)).toSet
        val bIds = bigByDom(dom).map(_.getLong(0)).toSet
        assert(sIds.subsetOf(bIds),
          s"domain $dom: target grew $sTarget → $bTarget but kept set is not a prefix extension")
      }
    }
  }

  test("temperatureMix excludes null domains from weights AND draws") {
    val df = ((1L to 20L).map(i => (i, Some("a"))) ++
      (21L to 40L).map(i => (i, Option.empty[String]))).toDF("id", "dom")
    val out = Sampling.temperatureMix(df, "dom", "id", totalRows = 10L).collect()
    assert(out.length == 10, s"null-domain rows must not dilute the draw, got ${out.length}")
    assert(out.forall(_.getString(0) == "a")) // join key (dom) leads the output
  }

  test("temperatureMix caps a tiny domain at its population") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ Seq((1000L, "tiny")))
      .toDF("id", "dom")
    val out = Sampling.temperatureMix(df, "dom", "id", totalRows = 50L)
      .select("dom").collect().map(_.getString(0))
    val byDom = out.groupBy(identity).view.mapValues(_.length).toMap
    // w(big)=10, w(tiny)=1, W=11: tiny's share 50*1/11 = 4 (+maybe 1) but
    // its population is 1 — the cap must bind
    assert(byDom("tiny") == 1, s"tiny domain must cap at its 1 row, got $byDom")
    assert(byDom("big") >= 45, s"big domain takes its Hamilton share, got $byDom")
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

  test("bottomK draws the same exact-k subset under any partitioning") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val a = Sampling.bottomK(docs, "doc_id", 20)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.bottomK(docs.repartition(13), "doc_id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 20 && a == b)
    // bottom-k nests: growing the budget only ADDS rows (the sketch
    // property that makes the sample auditable incrementally)
    val c = Sampling.bottomK(docs, "doc_id", 40)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c))
    // local top-k + bounded merge, not a corpus sort
    val plan = Sampling.bottomK(docs, "doc_id", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("priorityK is partition-stable, weight-sensitive, and heap-planned") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
    val a = Sampling.priorityK(docs, "doc_id", "n_chars", 20)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.priorityK(docs.repartition(13), "doc_id", "n_chars", 20)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 20 && a == b)
    // weight sensitivity: a 1000x weight boost must pull a doc into the
    // sample that the unboosted draw left out
    import org.apache.spark.sql.functions._
    val outsider = docs.filter(!col("doc_id").isInCollection(a.toSeq))
      .select(min(col("doc_id"))).collect().head.getLong(0)
    val boosted = docs.withColumn("n_chars",
      when(col("doc_id") === outsider, col("n_chars") * 100000L)
        .otherwise(col("n_chars")))
    val c = Sampling.priorityK(boosted, "doc_id", "n_chars", 20)
      .collect().map(_.getLong(0)).toSet
    assert(c.contains(outsider))
    val plan = Sampling.priorityK(docs, "doc_id", "n_chars", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
