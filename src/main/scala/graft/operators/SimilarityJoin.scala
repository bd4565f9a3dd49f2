package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs set-similarity self-join with a LOSSLESS prefix filter
  * (SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 / Xiao et al.
  * WWW'08): emit every unordered pair of documents whose element sets
  * have Jaccard >= tNum/tDen — without the quadratic all-pairs scan.
  *
  * Prefix-filtering principle: order every set by ONE global total
  * order (ascending global frequency, then the element string — rarest
  * first), and take each set's first `|x| - ceil(t·|x|) + 1` elements.
  * Any two sets with Jaccard >= t MUST share a prefix element, so the
  * candidate join on prefix elements loses nothing; candidates are then
  * verified with the exact integer cross-multiplied test
  * `tDen·|∩| >= tNum·|∪|` — no float division anywhere.
  *
  * The threshold is a RATIONAL (tNum/tDen) and ceil is integer
  * arithmetic (`(tNum·n + tDen - 1) div tDen`), so prefix lengths —
  * and therefore the candidate set — are bit-identical in any engine.
  * Verification intersects sorted xxhash64 arrays with the codegen
  * [[graft.expressions.TextKernels.interCountSorted]] kernel (the
  * q_ngram_jaccard modulo-collisions discipline: exact at any
  * vocabulary where 64-bit hashes don't collide).
  *
  * 100 TB shape: the element-frequency table is vocabulary-sized; the
  * per-document sort shuffles (id, element) pairs once; the candidate
  * join shuffles PREFIX elements only (a (1-t)-fraction of the corpus
  * elements — the whole point of the filter); verification joins carry
  * ids + hash arrays, never text. Rare-first ordering keeps hot
  * elements OUT of prefixes, which is what bounds the candidate join's
  * skew: the most frequent elements appear in no prefix unless a set is
  * nearly all-stopwords.
  */
object SimilarityJoin {

  /** The checkpointed per-document representation: element hashes sorted
    * rarest-first, the prefix length, and the ascending hash array for
    * verification.
    */
  def sortedRepr(
      docs: DataFrame,
      idCol: String,
      elemsCol: String,
      tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0, 1], got $tNum/$tDen")
    // Two traps around the (typically HOF-built, interpreted) element
    // array, both measured at sf0.1:
    //  * NO null filter on elemsCol: a filter referencing the array
    //    forces the interpreted lambda to re-evaluate per consumer
    //    (4.4 s → 0.5 s warm for the element build when dropped), and it
    //    is redundant — explode(array_distinct(NULL)) yields no rows, so
    //    null element arrays drop out in the explode itself.
    //  * els is CHECKPOINTED: it feeds the frequency aggregate AND the
    //    re-join, and without materialization each consumer re-runs the
    //    tokenize+explode subtree. Post-hash it is two longs per element
    //    occurrence — the cheapest point in the pipeline to cut.
    // Elements are replaced by xxhash64 right after the per-doc
    // distinct: every downstream shuffle — the frequency aggregate, its
    // re-join, and above all the candidate equi-join on prefix elements —
    // carries 8-byte longs instead of element strings, and the per-doc
    // collect/sort handles long structs instead of string structs.
    // Together the three changes take the full q_jaccard_join from ~8 s
    // to ~2.5 s warm at sf0.1 (isolated reruns). Soundness
    // is unchanged: (cnt, hash) is as valid a global total order as
    // (cnt, string) — the prefix principle needs only ONE total order —
    // and a 64-bit collision can only ADD a candidate pair (verified
    // afterwards) or overcount an intersection, the same no-collision
    // discipline the hash-array verify step already carried. `n` still
    // counts distinct element STRINGS (hashing happens after the
    // distinct, one row per element either way); xxhash64 on the
    // exploded scalar is native codegen, not an interpreted HOF pass.
    val els = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(array_distinct(col(elemsCol))).as("el"))
      // null ELEMENTS are dropped before hashing: xxhash64(NULL) is the
      // seed constant, not null, so an unfiltered null would become a
      // real "element" shared by every doc that carries one — the string
      // pipeline's null-unsafe equi-join dropped them, and this filter
      // (on the exploded scalar, not the HOF array — no re-eval trap)
      // preserves that contract
      .filter(col("el").isNotNull)
      .select(col("id"), xxhash64(col("el")).as("h"))
      .localCheckpoint(true)
    val freq = els.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    // one sorted representation per doc: rarest-first (cnt, h) is a
    // total order, so every engine derives the same prefix
    els.join(freq, Seq("h"))
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(cnt, h))), s -> s.h)").as("arr"),
        count(lit(1)).as("n"))
      .withColumn("plen",
        col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + lit(1L))
      // the verify array is the SAME hashes re-sorted ascending — no
      // second hashing pass over the elements
      .withColumn("harr", expr("array_sort(arr)"))
      .localCheckpoint(true) // consumed by both candidate sides + verify
  }

  /** The candidate-generating prefix element stream `(id, n, el)` (`el`
    * is the element's xxhash64) — public so the pruning property (prefix
    * rows << element rows) is testable, not just the end-to-end pair set.
    */
  def prefixes(
      docs: DataFrame,
      idCol: String,
      elemsCol: String,
      tNum: Int,
      tDen: Int): DataFrame =
    prefixStream(sortedRepr(docs, idCol, elemsCol, tNum, tDen))

  private def prefixStream(sorted: DataFrame): DataFrame = sorted
    .select(col("id"), col("n"), explode(expr("slice(arr, 1, CAST(plen AS INT))")).as("el"))

  /** Pairs `(id_a < id_b, n_inter, n_union)` with
    * `n_inter/n_union >= tNum/tDen`, over the DISTINCT elements of
    * `elemsCol` (an `array<string>` column). Rows with NULL ids or NULL
    * element arrays are dropped.
    */
  def jaccardJoin(
      docs: DataFrame,
      idCol: String,
      elemsCol: String,
      tNum: Int,
      tDen: Int): DataFrame = {
    val sorted = sortedRepr(docs, idCol, elemsCol, tNum, tDen)
    val pfx = prefixStream(sorted)
    val cands = pfx.select(col("id").as("id_a"), col("n").as("na"), col("el"))
      .join(pfx.select(col("id").as("id_b"), col("n").as("nb"), col("el")), Seq("el"))
      .filter(col("id_a") < col("id_b"))
      // length filter: |y| >= t·|x| both ways, or Jaccard can't reach t
      .filter(col("nb") * tDen >= col("na") * tNum &&
        col("na") * tDen >= col("nb") * tNum)
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(sorted.select(col("id").as("id_a"), col("harr").as("ha"), col("n").as("na")), Seq("id_a"))
      .join(sorted.select(col("id").as("id_b"), col("harr").as("hb"), col("n").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.functions.inter_count_sorted(col("ha"), col("hb"))
          .cast("long").as("n_inter"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"))
      .filter(col("n_inter") * tDen >= col("n_union") * tNum)
  }

  /** All-pairs COSINE similarity join over integer term-frequency
    * vectors — the classic inverted-index (term-at-a-time) formulation:
    * postings `(term, id, tf)` self-join on the term, partial dot
    * products map-side-combine into `dot(a,b)`, and the cosine
    * threshold applies as the integer cross-multiplied test
    * `tDen²·dot² >= tNum²·‖a‖²·‖b‖²` (valid because tf >= 0 ⇒ dot >= 0)
    * — no float anywhere, so the pair set replays bit-identically in
    * any engine. Emits `(id_a < id_b, dot, na2, nb2)`.
    *
    * `maxDf` redefines the vector space to tokens with document
    * frequency <= maxDf — the standard stop-term cut that bounds the
    * hottest posting lists' quadratic pair expansion. It is a SEMANTIC
    * parameter, not an approximation knob: the result is exactly the
    * cosine join over the df-filtered vocabulary (an oracle mirrors the
    * same cut), unlike a recall-trading LSH bucket cap. At corpus scale
    * always set it (df-capped postings bound the per-term join at
    * maxDf²; the df table itself is vocabulary-sized), and compose with
    * [[Boilerplate]]'s df-cut for the text-cleaning variant.
    *
    * The comparison runs in DECIMAL(38,0) ([[QuantileNorm]]'s overflow
    * law): dot can reach ~1e9 on long documents, so tDen²·dot² would
    * silently wrap a 64-bit product under non-ANSI mode.
    *
    * Elements hash through xxhash64 before the postings join (8-byte
    * shuffle keys, the [[sortedRepr]] discipline); a 64-bit collision
    * merges two terms' postings — the q_ngram_jaccard
    * modulo-collisions contract, none at tested vocabulary sizes.
    */
  /** All-pairs set-CONTAINMENT join: for unordered pairs sharing any
    * element, the distinct-element overlap `inter = |A∩B|` with both
    * set sizes and the two DIRECTED containment verdicts
    * `a_in_b ⇔ tDen·inter >= tNum·|A|` (and symmetrically) — kept when
    * either direction passes. Containment is the ASYMMETRIC similarity
    * (Broder 1997's "containment"): a short quote inside a long
    * document scores near 1 where Jaccard scores near 0 — the
    * quote/subset-duplicate detector a corpus cleaner runs beside the
    * symmetric joins. Pure integer tests — the pair set replays
    * bit-identically in any engine.
    *
    * Same machinery and scale posture as [[tfCosineJoin]]: xxhash64'd
    * postings, one self-join on the element key with map-side-combined
    * intersection counts, and the same SEMANTIC `maxDf` stop-element
    * cut bounding hot posting lists. Counts stay far inside 64 bits
    * (inter ≤ min set size), so no DECIMAL widening is needed.
    */
  def containmentJoin(
      docs: DataFrame,
      idCol: String,
      elemsCol: String,
      tNum: Int,
      tDen: Int,
      maxDf: Option[Long] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0, 1], got $tNum/$tDen")
    val sets = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(col(elemsCol)).as("el"))
      .filter(col("el").isNotNull)
      .select(col("id"), xxhash64(col("el")).as("h"))
      .distinct()
      .localCheckpoint(true)
    val kept = maxDf match {
      case Some(cap) =>
        val dfOk = sets.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("h"))
        sets.join(dfOk, Seq("h"), "left_semi").localCheckpoint(true)
      case None => sets
    }
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = kept.select(col("h"), col("id").as("id_a"))
      .join(kept.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("a_in_b",
        lit(tDen.toLong) * col("inter") >= lit(tNum.toLong) * col("na"))
      .withColumn("b_in_a",
        lit(tDen.toLong) * col("inter") >= lit(tNum.toLong) * col("nb"))
      .filter(col("a_in_b") || col("b_in_a"))
      .select(col("id_a"), col("id_b"), col("inter"), col("na"), col("nb"),
        col("a_in_b"), col("b_in_a"))
  }

  def tfCosineJoin(
      docs: DataFrame,
      idCol: String,
      elemsCol: String,
      tNum: Int,
      tDen: Int,
      maxDf: Option[Long] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0, 1], got $tNum/$tDen")
    val tf = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(col(elemsCol)).as("el"))
      .filter(col("el").isNotNull)
      .select(col("id"), xxhash64(col("el")).as("h"))
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("tf"))
      // feeds the df cut (when set), the norms, and both posting sides —
      // checkpoint so the tokenize+explode subtree runs once
      .localCheckpoint(true)
    val kept = maxDf match {
      case Some(cap) =>
        val dfOk = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("h"))
        tf.join(dfOk, Seq("h"), "left_semi").localCheckpoint(true)
      case None => tf
    }
    val norms = kept.groupBy(col("id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = kept.select(col("h"), col("id").as("id_a"), col("tf").as("tf_a"))
      .join(kept.select(col("h"), col("id").as("id_b"), col("tf").as("tf_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    dots
      .join(norms.select(col("id").as("id_a"), col("n2").as("na2")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
      .filter(lit(tDen.toLong * tDen).cast(dec) * col("dot") * col("dot") >=
        lit(tNum.toLong * tNum).cast(dec) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"), col("nb2"))
  }
}
