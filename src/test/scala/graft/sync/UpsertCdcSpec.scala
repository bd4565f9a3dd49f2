package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertCdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, payload, cursor) snapshot; (key, payload, cursor, op) changes
  private val snapshot = Seq(
    (1L, "a0", 10L),
    (2L, "b0", 10L),
    (3L, "c0", 10L)).toDF("k", "p", "cur")

  test("applyCdc: upsert wins over snapshot, delete removes, unseen key inserts") {
    val changes = Seq(
      (1L, "a1", 20L, "U"), // update existing
      (2L, "b1", 20L, "D"), // delete existing
      (4L, "d1", 20L, "U")) // brand-new key
      .toDF("k", "p", "cur", "op")
    val out = Upsert.applyCdc(snapshot, changes, Seq("k"), "cur", "op")
      .select("k", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a1"), (3L, "c0"), (4L, "d1")))
  }

  test("applyCdc: later change supersedes earlier, including delete-then-reinsert") {
    val changes = Seq(
      (1L, "a1", 20L, "D"), // delete...
      (1L, "a2", 30L, "U"), // ...then reinsert: key survives with a2
      (2L, "b1", 20L, "U"),
      (2L, "b2", 30L, "D")) // update then delete: key gone
      .toDF("k", "p", "cur", "op")
    val out = Upsert.applyCdc(snapshot, changes, Seq("k"), "cur", "op")
      .select("k", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a2"), (3L, "c0")))
  }

  test("applyCdc: cursor ties break by the tiebreak column, deterministically") {
    val changes = Seq(
      (1L, "tie-lo", 10L, "U"),
      (1L, "tie-hi", 10L, "U"))
      .toDF("k", "p", "cur", "op")
      .withColumn("tb", when(col("p") === "tie-hi", 9L).otherwise(5L))
    val snap = snapshot.withColumn("tb", lit(0L))
    val out = Upsert.applyCdc(snap, changes, Seq("k"), "cur", "op", tiebreak = Seq("tb"))
      .filter(col("k") === 1L).select("p").as[String].collect().toSeq
    assert(out == Seq("tie-hi"))
  }

  test("applyCdc: a NULL/unknown op upserts rather than silently deleting") {
    val changes = Seq(
      (1L, "a1", 20L, null.asInstanceOf[String]), // malformed op from upstream
      (2L, "b1", 20L, "X"))                       // unrecognized op code
      .toDF("k", "p", "cur", "op")
    val out = Upsert.applyCdc(snapshot, changes, Seq("k"), "cur", "op")
      .select("k", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // both keys survive with the change payload — data is never dropped
    // on an op code the mapping didn't recognize
    assert(out == Set((1L, "a1"), (2L, "b1"), (3L, "c0")))
  }

  test("applyCdc refuses a snapshot that already carries the op column") {
    val bad = snapshot.withColumn("op", lit("U"))
    val changes = Seq((1L, "a1", 20L, "U")).toDF("k", "p", "cur", "op")
    intercept[IllegalArgumentException] {
      Upsert.applyCdc(bad, changes, Seq("k"), "cur", "op")
    }
  }

  test("mergeInto: the full clause ladder on one joined pass") {
    val target = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("tk", "bal")
    val source = Seq((1L, 5L), (2L, 50L), (9L, 7L)).toDF("sk", "amt")
    val out = Upsert.mergeInto(target, source, "tk", "sk",
        deleteWhen = col("amt") >= 50,               // key 2 deleted
        updateSet = Map("bal" -> (col("bal") + col("amt"))), // key 1: 105
        insertSet = Map("bal" -> (col("amt") * 10))) // key 9: 70
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 105L, "update"),
      (3L, 300L, "keep"),   // no source match: unchanged
      (9L, 70L, "insert")))
  }

  test("mergeInto: untouched target columns survive updates and null on inserts") {
    val target = Seq((1L, 100L, "x"), (2L, 200L, "y")).toDF("tk", "bal", "tag")
    val source = Seq((1L, 5L), (9L, 7L)).toDF("sk", "amt")
    val rows = Upsert.mergeInto(target, source, "tk", "sk",
        deleteWhen = lit(false),
        updateSet = Map("bal" -> (col("bal") + col("amt"))),
        insertSet = Map("bal" -> col("amt")))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), Option(r.getString(2)), r.getString(3)))).toMap
    assert(rows(1L) == ((105L, Some("x"), "update"))) // tag untouched by update
    assert(rows(2L) == ((200L, Some("y"), "keep")))
    assert(rows(9L) == ((7L, None, "insert")))        // no insertSet entry → null
  }

  test("mergeInto rejects colliding column names loudly") {
    val target = Seq((1L, 100L)).toDF("k", "bal")
    val source = Seq((1L, 5L)).toDF("k", "amt")
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(target, source, "k", "k",
        lit(false), Map.empty, Map.empty)
    }
    val source2 = Seq((1L, 5L)).toDF("sk", "bal") // non-key overlap
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(target, source2, "k", "sk",
        lit(false), Map.empty, Map.empty)
    }
  }
}
