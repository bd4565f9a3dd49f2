package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profile + Validate on planted data where every stat is hand-checkable. */
class QualitySpec extends SparkSpec {

  private lazy val df = {
    val rows = Seq(
      (1L, Some(10.0), "x"),
      (2L, None, "y"),
      (2L, Some(30.0), null),
      (4L, Some(30.0), "x"))
    spark.createDataFrame(rows.map { case (id, v, s) =>
      (id, v.map(Double.box).orNull, s)
    }).toDF("id", "v", "s")
  }

  test("profile reports nulls, distincts and typed min/max per column") {
    val p = Profile.profile(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getAs[Long]("n_rows") === 4L)
    assert(p("id").getAs[Long]("n_nulls") === 0L)
    assert(p("id").getAs[Long]("n_distinct") === 3L)
    assert(p("id").getAs[Double]("min_num") === 1.0)
    assert(p("id").getAs[Double]("max_num") === 4.0)
    assert(p("v").getAs[Long]("n_nulls") === 1L)
    assert(p("v").getAs[Long]("n_distinct") === 2L)
    assert(p("s").getAs[Long]("n_nulls") === 1L)
    assert(p("s").getAs[String]("min_str") === "x")
    assert(p("s").getAs[String]("max_str") === "y")
    assert(p("s").isNullAt(p("s").fieldIndex("min_num")))
  }

  test("validate rules count planted violations") {
    val parent = spark.createDataFrame(Seq(Tuple1(1L), Tuple1(2L))).toDF("pk")
    val audit = Validate.report(Seq(
      "pk_unique" -> Validate.unique(df, Seq("id")),          // id=2 twice -> 1
      "v_not_null" -> Validate.notNull(df, "v"),              // 1 null
      "fk_id" -> Validate.foreignKey(df, "id", parent, "pk"), // id=4 orphan (x2 rows? no, ids 1,2,2,4 -> 1 row with id=4)
      "v_range" -> Validate.inRange(df, "v", Some(lit(0.0)), Some(lit(20.0))), // 30,30 -> 2
      "s_domain" -> Validate.inSet(df, "s", Seq("x"))))       // "y" -> 1
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(audit("pk_unique") === ((1L, false)))
    assert(audit("v_not_null") === ((1L, false)))
    assert(audit("fk_id") === ((1L, false)))
    assert(audit("v_range") === ((2L, false)))
    assert(audit("s_domain") === ((1L, false)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; null values compare null-safe") {
    val old = spark.createDataFrame(Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, Some(4.0)))
      .map { case (k, v) => (k, v.map(Double.box).orNull) }).toDF("pk", "v")
    val neu = spark.createDataFrame(Seq(
      (2L, Some(2.0)), (3L, None), (4L, Some(40.0)), (5L, Some(5.0)))
      .map { case (k, v) => (k, v.map(Double.box).orNull) }).toDF("pk", "v")
    val out = Validate.snapshotDiff(old, neu, "pk", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1 removed, 5 added, 4 changed, 2 unchanged, 3 unchanged (null <=> null)
    assert(out === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 2L))
  }

  test("snapshotDiff treats an unchanged null-pk row as unchanged, not removed+added") {
    val old = spark.createDataFrame(Seq((null.asInstanceOf[java.lang.Long], 1.0)))
      .toDF("pk", "v")
    val neu = spark.createDataFrame(Seq((null.asInstanceOf[java.lang.Long], 1.0)))
      .toDF("pk", "v")
    val out = Validate.snapshotDiff(old, neu, "pk", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("unchanged" -> 1L))
  }

  test("a clean table passes every rule") {
    val clean = spark.createDataFrame(Seq((1L, 1.0, "x"), (2L, 2.0, "x")))
      .toDF("id", "v", "s")
    val audit = Validate.report(Seq(
      "pk" -> Validate.unique(clean, Seq("id")),
      "nn" -> Validate.notNull(clean, "v")))
      .collect()
    assert(audit.forall(_.getBoolean(2)))
    assert(audit.forall(_.getLong(1) == 0L))
  }
}
