package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  test("editDistanceSelfJoin agrees with the naive quadratic join on part names") {
    val part = Tables.part(spark, sf)
    val got = FuzzyJoin.editDistanceSelfJoin(part, "p_partkey", "p_name", maxDist = 2)
      .select("id_a", "id_b", "dist")

    val v = part.select(col("p_partkey").as("id"), col("p_name").as("s"))
    val naive = v.select(col("id").as("id_a"), col("s").as("s_a"))
      .crossJoin(v.select(col("id").as("id_b"), col("s").as("s_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= 2)

    assert(got.count() === naive.count())
    assert(got.except(naive).count() === 0)
    assert(naive.except(got).count() === 0)
  }

  test("short strings that share no gram are still paired (pigeonhole escape hatch)") {
    // "ab" vs "cd" is 2 substitutions with zero shared bigrams — a
    // gram-blocked join alone would silently miss it.
    val df = spark.createDataFrame(Seq(
      (1L, "ab"), (2L, "cd"), (3L, "x"), (4L, "xy"),
      (5L, "hello"), (6L, "hallo"), (7L, "help!"))).toDF("id", "name")
    val pairs = FuzzyJoin.editDistanceSelfJoin(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 2)))      // no shared gram
    assert(pairs.contains((3L, 4L, 1)))      // below gram length
    assert(pairs.contains((5L, 6L, 1)))
    assert(pairs.contains((5L, 7L, 2)))      // "hello" -> "help!"
    // distance-3 pairs are absent
    assert(!pairs.exists { case (a, b, _) => (a, b) == (2L, 5L) })
  }

  test("duplicate values expand to all id pairs at distance 0") {
    val df = spark.createDataFrame(Seq(
      (10L, "same"), (20L, "same"), (30L, "same"), (40L, "other"))).toDF("id", "name")
    val zero = FuzzyJoin.editDistanceSelfJoin(df, "id", "name", maxDist = 1)
      .filter(col("dist") === 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero === Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }
}
