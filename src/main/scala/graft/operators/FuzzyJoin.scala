package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string self-join — the entity-resolution /
  * record-linkage primitive a cleaning pipeline runs before exact dedup
  * can work ("red widgett" vs "red widget").
  *
  * The reference (tap-airbyte-wrapper) has no similarity join; this is part
  * of the LLM-pipeline surface the build brief asks for beyond the
  * reference's own operators, alongside graft.operators.Dedup.
  *
  * Algorithm (Ed-Join-style prefix filtering; Xiao, Wang & Lin, VLDB 2008 —
  * public literature, re-derived here on DataFrames):
  *
  *  1. '''Canonicalize to distinct values.''' All pairing runs on DISTINCT
  *     strings, then expands back to ids at the end. On a corpus with
  *     repeated values (product names, titles, URLs) this collapses the
  *     quadratic work onto the value vocabulary; on an all-unique column it
  *     is a no-op pass-through. The expansion joins are value-equality
  *     hash joins whose output is exactly the result set — never bigger.
  *  2. '''Candidate generation with a sound pigeonhole.''' An edit affects
  *     at most q of a string's distinct q-grams, so ed(a,b) <= k implies
  *     |G_a ∩ G_b| >= max(|G_a|,|G_b|) − k·q. With every string's grams
  *     ranked by one GLOBAL order (ascending document frequency, then gram
  *     — rarest first), the classic prefix-filter theorem says two strings
  *     meeting that overlap must share a gram within their first k·q + 1
  *     grams. We therefore index only min(|G|, k·q+1) RAREST grams per
  *     value and self-join on those — candidates shrink with gram rarity
  *     instead of exploding on "the ", exactly the Ed-Join trick.
  *  3. '''Short-string escape hatch.''' The pigeonhole is vacuous when both
  *     strings have <= k·q grams (e.g. "ab" vs "cd" are 2 edits apart and
  *     share nothing), so values with len <= k·q + q − 1 pair among
  *     themselves directly. That class is a BOUNDED VOCABULARY (strings of
  *     at most a few characters) regardless of corpus size — the side is
  *     broadcast by construction, not by hope.
  *  4. '''Banded verify.''' Survivors run through Spark's threshold-banded
  *     `levenshtein(a, b, k)` (O(k·n) per pair, codegen'd) — false
  *     positives die here, so steps 1–3 only ever affect COST, never the
  *     result.
  *
  * Scale shape: one narrow gram explode over distinct values; the gram df
  * table is bounded by the q-gram alphabet and broadcast; one shuffle of
  * (value, gram) for prefix ranking; the candidate self-join ships only
  * (gram, value) prefix rows; two hash joins expand values back to ids.
  * No cross join anywhere on the unbounded side.
  */
object FuzzyJoin {

  /** All id pairs (id_a < id_b) whose `strCol` values are within `maxDist`
    * edits (Levenshtein). Output: (id_a, id_b, name_a, name_b, dist) where
    * name_x is id_x's value and dist is the exact edit distance.
    */
  /** Distinct-VALUE pairs within `maxDist` edits: (__sa, __sb, __dist)
    * with __sa < __sb. This is the scale unit of the whole operator —
    * everything downstream of it (id expansion in
    * [[editDistanceSelfJoin]], value-graph clustering in an
    * entity-resolution pipeline) is value-vocabulary-sized, not
    * corpus-sized.
    */
  def valuePairs(
      df: DataFrame,
      strCol: String,
      maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val k = maxDist
    val kq = k * q
    val values = df.select(col(strCol).as("__s"))
      .filter(col("__s").isNotNull).distinct()

    // Distinct q-grams (set semantics — the pigeonhole bound above is the
    // set version: one edit removes at most q elements from the gram SET).
    // Strings shorter than q carry themselves as their single gram.
    val gramArr = expr(
      s"""array_distinct(CASE WHEN length(__s) < $q THEN array(__s)
         |ELSE transform(sequence(1, length(__s) - ${q - 1}),
         |               i -> substring(__s, i, $q)) END)""".stripMargin)
    val grams = values.select(col("__s"), explode(gramArr).as("__g"))

    // Global gram order = (df asc, gram asc): rarest first. The table is
    // bounded by the q-gram alphabet — broadcast, never shuffled against.
    val dfreq = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    val prefix = grams
      .join(broadcast(dfreq), "__g")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__s").orderBy(col("__df").asc, col("__g").asc)))
      .filter(col("__rn") <= kq + 1)
      .select("__s", "__g")

    val glen: Column => Column = s => greatest(length(s) - (q - 1), lit(1))

    // Long-pair candidates: share a prefix gram, lengths within k, and at
    // least one side has > k·q grams (the regime where the pigeonhole is
    // binding; both-short pairs come from the escape hatch below).
    val candLong = prefix.select(col("__s").as("__sa"), col("__g"))
      .join(prefix.select(col("__s").as("__sb"), col("__g")), Seq("__g"))
      .filter(col("__sa") < col("__sb"))
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= k)
      .filter(greatest(glen(col("__sa")), glen(col("__sb"))) > kq)
      .select("__sa", "__sb")
      .distinct()

    val short = values.filter(glen(col("__s")) <= kq)
    val candShort = short.select(col("__s").as("__sa"))
      .join(broadcast(short.select(col("__s").as("__sb"))),
        col("__sa") < col("__sb") &&
          abs(length(col("__sa")) - length(col("__sb"))) <= k)

    // Banded exact verify: levenshtein(a, b, k) returns -1 above k.
    candLong.unionByName(candShort)
      .withColumn("__dist", levenshtein(col("__sa"), col("__sb"), k))
      .filter(col("__dist") >= 0)
  }

  def editDistanceSelfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 2): DataFrame = {
    // The id is normalized to long for the least/greatest canonical
    // ordering below. That cast is lossless ONLY for integral ids — any
    // other type would silently null (dropping rows from the expansion
    // joins), so non-integral ids are rejected up front.
    val idType = df.schema(idCol).dataType
    require(
      idType.isInstanceOf[org.apache.spark.sql.types.ByteType] ||
        idType.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
        idType.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
        idType.isInstanceOf[org.apache.spark.sql.types.LongType],
      s"editDistanceSelfJoin: id column $idCol must be an integral type, got $idType")
    val base = df
      .select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    val vpairs = valuePairs(df, strCol, maxDist, q)

    // Expand distinct-value pairs back to id pairs; names follow ids after
    // the least/greatest normalization (distance is symmetric).
    val ia = base.select(col("__s").as("__sa"), col("__id").as("__ida"))
    val ib = base.select(col("__s").as("__sb"), col("__id").as("__idb"))
    val crossVal = vpairs
      .join(ia, "__sa")
      .join(ib, "__sb")
      .select(
        least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        when(col("__ida") < col("__idb"), col("__sa")).otherwise(col("__sb")).as("name_a"),
        when(col("__ida") < col("__idb"), col("__sb")).otherwise(col("__sa")).as("name_b"),
        col("__dist").as("dist"))

    // Same-value id pairs (distance 0): a value-equality self-join whose
    // output IS the result rows — no candidate blowup possible.
    val eqVal = ia
      .join(ib, col("__sa") === col("__sb") && col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("__sa").as("name_a"), col("__sb").as("name_b"),
        lit(0).as("dist"))

    crossVal.unionByName(eqVal)
  }
}
