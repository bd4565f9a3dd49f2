package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle") {
    val n = 1000
    val facts = (1 to n).map(i => (i.toLong % 50, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    Layout.writeBucketed(facts, "facts_b", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    Layout.writeBucketed(dims, "dims_b", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (at test sizes broadcast would win and
      // bucketing would be moot — at 100 TB neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"))
      assert(joined.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("registerBucketed re-attaches existing files with the bucket spec intact") {
    // the session-restart path: files written by one catalog life must
    // re-register via DDL and STILL join shuffle-free — a registration
    // that drops the bucket spec would silently re-grow exchanges in
    // every post-restart bench pass
    val n = 600
    val facts = (1 to n).map(i => (i.toLong % 40, i.toLong)).toDF("k", "id")
    val dims = (0L until 40L).map(k => (k, s"d_$k")).toDF("k", "name")
    val base = java.nio.file.Files.createTempDirectory("reg_bkt").toString
    Layout.writeBucketed(facts, "facts_rb", Seq("k"), numBuckets = 8,
      sortCols = Seq("k"), path = Some(s"$base/facts"))
    Layout.writeBucketed(dims, "dims_rb", Seq("k"), numBuckets = 8,
      sortCols = Seq("k"), path = Some(s"$base/dims"))
    // simulate the restart: catalog forgets, files remain
    spark.sql("DROP TABLE facts_rb")
    spark.sql("DROP TABLE dims_rb")
    Layout.registerBucketed(spark, "facts_rb", facts.schema, Seq("k"), 8,
      Seq("k"), s"$base/facts")
    Layout.registerBucketed(spark, "dims_rb", dims.schema, Seq("k"), 8,
      Seq("k"), s"$base/dims")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("facts_rb").join(spark.table("dims_rb"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"re-registered bucketed join must stay shuffle-free, got:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(joined.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS facts_rb")
      spark.sql("DROP TABLE IF EXISTS dims_rb")
    }
  }

  test("registerBucketed rejects a drifted bucket spec loudly") {
    val facts = (1 to 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "id")
    val base = java.nio.file.Files.createTempDirectory("reg_drift").toString
    Layout.writeBucketed(facts, "facts_dr", Seq("k"), numBuckets = 8,
      sortCols = Seq("k"), path = Some(s"$base/facts"))
    spark.sql("DROP TABLE facts_dr")
    // sidecar present: ANY drift (even MORE buckets, invisible to the
    // file-id range) must raise instead of silently mis-bucketing
    val e1 = intercept[IllegalArgumentException] {
      Layout.registerBucketed(spark, "facts_dr", facts.schema, Seq("k"), 16,
        Seq("k"), s"$base/facts")
    }
    assert(e1.getMessage.contains("spec drift"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.registerBucketed(spark, "facts_dr", facts.schema, Seq("id"), 8,
        Seq("k"), s"$base/facts")
    }
    assert(e2.getMessage.contains("spec drift"))
    // sidecar removed (pre-r16 files): the file-name bucket ids still
    // catch registration with FEWER buckets than written
    new java.io.File(s"$base/facts/_graft_bucket_spec.json").delete()
    val e3 = intercept[IllegalArgumentException] {
      Layout.registerBucketed(spark, "facts_dr", facts.schema, Seq("k"), 4,
        Seq("k"), s"$base/facts")
    }
    assert(e3.getMessage.contains("bucket ids"))
    // and the true spec still registers fine without the sidecar
    Layout.registerBucketed(spark, "facts_dr", facts.schema, Seq("k"), 8,
      Seq("k"), s"$base/facts")
    assert(spark.table("facts_dr").count() == 100)
    spark.sql("DROP TABLE IF EXISTS facts_dr")
  }

  test("salted join matches plain join results") {
    // heavy skew: 90% of rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i)).toDF("k", "payload")
    val small = (0L to 10L).map(k => (k, s"v$k")).toDF("k", "attr")
    val plain = big.join(small, "k").select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Layout.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 2000)
  }

  test("salted join exchanges on (key, __salt) when neither side broadcasts") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i)).toDF("k", "payload")
    val small = (0L to 10L).map(k => (k, s"v$k")).toDF("k", "attr")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at 100 TB neither side broadcasts — that is the regime salting
      // exists for, so assert the plan shape there
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.saltedJoin(big, small, "k", salts = 8)
      joined.collect() // finalize AQE so the executed plan is real
      val plan = joined.queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(plan).isDefined,
        s"expected the join exchange to partition on (k, __salt), got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q_join_bucketed runs join AND group-by with zero exchanges") {
    // the driver query's whole pipeline — bucketed scan → sort-merge join →
    // aggregate on a superset of the bucket key — must plan without any
    // shuffle: that is the layout's promise at 100 TB
    val df = graft.SparkEntry.queries("q_join_bucketed")(spark, sf)
    df.collect() // finalize AQE so the executed plan is real
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected a zero-exchange bucketed join+agg, got:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
  }

  test("q_clustered_scan prunes to the filtered day partitions") {
    val df = graft.SparkEntry.queries("q_clustered_scan")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the RANGE predicates must reach PartitionFilters — isnotnull(day)
    // alone would match a lazier check while every day directory scans
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("day") && pf.contains(">=") && pf.contains("<="),
      s"expected day range predicates in PartitionFilters, got '$pf' in:\n$plan")
  }

  test("salted aggregate equals direct aggregate") {
    val df = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong % 5 else 0L, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Layout.saltedAggregate(df, "k", salts = 8,
      partial = Seq("n" -> count(lit(1)), "s" -> sum(col("v"))),
      fin = Seq("n" -> sum(col("n")), "s" -> sum(col("s"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
