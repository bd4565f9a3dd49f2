package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves [[Dedup.sortedNeighborhood]] (range-bucketed local ranks +
  * offset recovery — the 100 TB shape) emits EXACTLY the pair set of the
  * single-partition global-window reference, for several bucket counts
  * including far more buckets than rows (forcing empty and 1-row
  * buckets, the boundary-handling worst case). Cross-boundary pairs are
  * carried by rank offsets, not bucket adjacency, so equality must hold
  * for ANY boundary placement.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  private def referencePairs(df: DataFrame, w: Int, maxDist: Int): Set[(Long, Long, Int)] = {
    val ranked = df.select(col("p_partkey"), col("p_name"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("p_name"), col("p_partkey"))).cast("long"))
    val a = ranked.select(col("rnk").as("rnk_a"),
      col("p_partkey").as("id_a"), col("p_name").as("na"))
      .withColumn("k", explode(expr(s"sequence(1L, ${w}L)")))
      .withColumn("rnk_b", col("rnk_a") + col("k"))
    val b = ranked.select(col("rnk").as("rnk_b"),
      col("p_partkey").as("id_b"), col("p_name").as("nb"))
    a.join(b, Seq("rnk_b"))
      .filter(levenshtein(col("na"), col("nb")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("na"), col("nb")).cast("int").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def operatorPairs(df: DataFrame, w: Int, maxDist: Int,
      nRanges: Int): Set[(Long, Long, Int)] =
    Dedup.sortedNeighborhood(df, "p_partkey", "p_name", w, maxDist, nRanges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("bucketed pair set == global-window pair set across bucket counts") {
    val part = graft.Tables.part(spark, sf)
    val ref = referencePairs(part, 3, 2)
    assert(ref.nonEmpty, "fixture must yield at least one neighbor pair")
    for (nRanges <- Seq(1, 2, 8, 64)) {
      assert(operatorPairs(part, 3, 2, nRanges) == ref,
        s"pair-set mismatch at numRanges=$nRanges")
    }
  }

  test("more buckets than rows (empty + singleton buckets) still exact") {
    val tiny = graft.Tables.part(spark, sf).limit(17)
    val ref = referencePairs(tiny, 5, 3)
    assert(operatorPairs(tiny, 5, 3, 200) == ref)
  }

  test("wider window crosses several bucket boundaries exactly") {
    val part = graft.Tables.part(spark, sf)
    val ref = referencePairs(part, 7, 2)
    assert(operatorPairs(part, 7, 2, 16) == ref)
  }

  test("misuse fails loudly: non-string key, null-under-cast id (r11 ADVICE)") {
    import spark.implicits._
    val intKey = Seq((1L, 42L), (2L, 43L)).toDF("id", "key")
    val e1 = intercept[IllegalArgumentException](
      Dedup.sortedNeighborhood(intKey, "id", "key"))
    assert(e1.getMessage.contains("must be StringType"), e1.getMessage)
    val badId = Seq(("x1", "alpha"), ("7", "beta")).toDF("id", "key")
    val e2 = intercept[Exception](
      Dedup.sortedNeighborhood(badId, "id", "key").collect())
    assert(e2.getMessage.contains("non-null and long-castable") ||
      e2.getMessage.contains("CAST_INVALID_INPUT"), e2.getMessage)
  }
}
