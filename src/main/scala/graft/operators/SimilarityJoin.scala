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
}
