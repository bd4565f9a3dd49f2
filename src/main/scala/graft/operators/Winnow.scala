package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local document-fingerprinting algorithm, public): hash every
  * token k-gram, slide a w-wide window over the hash sequence, and keep
  * each window's RIGHTMOST MINIMAL hash. The selected ~2/(w+1) fraction
  * of shingles is position-independent ("local": any shared substring of
  * ≥ w+k-1 tokens is guaranteed to share a fingerprint), which makes the
  * fingerprint index both far smaller than the full shingle set and
  * still complete for near-dup / plagiarism matching.
  *
  * Determinism: hashes are portable md5 hex strings (the repo's
  * cross-engine hash convention), and the rightmost-minimum rule is the
  * single struct-min `min(struct(hash, -pos))` — a total order both
  * engines share, so ties from REPEATED shingles (common in boilerplate)
  * resolve identically everywhere. This is "non-robust" winnowing —
  * every window's rightmost minimum, a stateless rule — rather than the
  * paper's stateful robust variant, precisely so the selection is a pure
  * window expression any engine can replay.
  *
  * Scale shape: the k-gram explode and the selection window are both
  * partitioned BY DOCUMENT — parallelism = corpus size, each partition
  * bounded by document length, never by data volume. Matching shuffles
  * only (fingerprint, doc_id) pairs — the ids-only discipline of the
  * dedup family — over an index ~40% the size of the full shingle set.
  */
object Winnow {

  /** Distinct selected fingerprints per doc: `(idCol, sel_pos, fp,
    * n_grams)` with 0-based positions. Docs with fewer than k tokens
    * have no k-grams and are absent, identically on both engines.
    */
  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    val gramExpr = (0 until k).map(j => s"tk[i+$j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    val grams = docs
      .select(col(idCol), gfn.ascii_tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= k)
      .withColumn("n_grams", (size(col("tk")) - (k - 1)).cast("long"))
      .select(col(idCol), col("n_grams"), posexplode(expr(
        s"transform(sequence(0, size(tk)-$k), i -> $gramExpr)")).as(Seq("pos", "g")))
      .withColumn("h", md5(col("g")))
    val frame = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("m", min(struct(col("h").as("h"),
        (-col("pos")).cast("long").as("np"))).over(frame))
      // window STARTS only: positions 0..max(n_grams-w, 0) — the final
      // partial windows are suffixes of the last full one (or, for docs
      // shorter than w grams, the single all-grams window at start 0)
      .filter(col("pos") <= greatest(col("n_grams") - w, lit(0L)))
      .select(col(idCol), col("n_grams"),
        (-col("m.np")).as("sel_pos"), col("m.h").as("fp"))
      .distinct()
  }

  /** Per-doc fingerprint profile with the winnowing DENSITY GUARANTEE as
    * an oracle-checkable certificate: consecutive selected positions can
    * never be more than w apart (every window contains a selection), so
    * `gap_ok` must be true on every row — a structural theorem, not a
    * statistical bound.
    */
  def profile(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
    val lagW = Window.partitionBy(col(idCol)).orderBy(col("sel_pos"))
    fp.withColumn("gap", col("sel_pos") - lag(col("sel_pos"), 1).over(lagW))
      .groupBy(col(idCol))
      .agg(max(col("n_grams")).as("n_grams"),
        countDistinct(col("sel_pos")).as("n_sel"),
        countDistinct(col("fp")).as("n_fp"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
      .withColumn("n_windows", greatest(col("n_grams") - w, lit(0L)) + 1L)
      .withColumn("gap_ok", col("max_gap") <= w)
      .select(col(idCol), col("n_grams"), col("n_windows"), col("n_sel"),
        col("n_fp"), col("max_gap"), col("gap_ok"))
  }

  /** Drop fingerprints whose doc frequency exceeds `maxDocFreq`
    * (0 = off) — the winnow analogue of the LSH family's armed bucket
    * caps. At 100 TB boilerplate shingles (headers, license blocks)
    * produce fingerprints shared by millions of docs; without the cap
    * the fp-keyed self-join expands df² pairs on exactly those keys —
    * the skew that kills the stage. The COUNT window over fp rides the
    * same hash shuffle the pair join needs next (one in-partition
    * sort, no second traversal — the capBuckets lesson from
    * Dedup.scala). A dropped fingerprint costs recall only on pairs
    * whose ONLY evidence is boilerplate — which is the pair set a
    * plagiarism/near-dup report wants suppressed anyway (MOSS itself
    * drops fingerprints shared by too many submissions for the same
    * reason).
    */
  private def capDocFreq(fp: DataFrame, maxDocFreq: Int): DataFrame =
    if (maxDocFreq <= 0) fp
    else {
      val w = Window.partitionBy(col("fp"))
      fp.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
    }

  /** Doc pairs sharing at least `minShared` distinct fingerprints —
    * the near-dup match step over the winnowed index. Shuffles
    * (fp, id) only; `maxDocFreq` (0 = off) arms the hot-fingerprint
    * cap ([[capDocFreq]]) bounding every fingerprint's pair expansion.
    */
  def matches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4,
      minShared: Long = 3L,
      maxDocFreq: Int = 0): DataFrame = {
    val fp = capDocFreq(
      fingerprints(docs, idCol, textCol, k, w)
        .select(col(idCol), col("fp")).distinct(),
      maxDocFreq)
    val a = fp.select(col(idCol).as("id_a"), col("fp"))
    val b = fp.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[matches]] with the MOSS report score: containment = shared
    * fingerprints over the SMALLER side's fingerprint count, as an
    * exact integer percentage (the "% match" a plagiarism report
    * shows; min-side normalization so a short doc fully contained in a
    * long one scores 100). One fingerprint pass feeds the pair join
    * and both per-doc counts — the index is never rebuilt.
    */
  def matchScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4,
      minShared: Long = 3L,
      maxDocFreq: Int = 0): DataFrame = {
    // cap BEFORE the pin so the count legs see the same capped index the
    // pair join does — containment stays internally consistent when armed
    val fp = capDocFreq(
      fingerprints(docs, idCol, textCol, k, w)
        .select(col(idCol), col("fp")).distinct(),
      maxDocFreq)
      .localCheckpoint(true) // pinned: feeds the pair join AND both count legs
    val counts = fp.groupBy(col(idCol)).agg(count(lit(1)).as("n_fp"))
    val a = fp.select(col(idCol).as("id_a"), col("fp"))
    val b = fp.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(counts.select(col(idCol).as("id_a"), col("n_fp").as("n_fp_a")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n_fp").as("n_fp_b")), Seq("id_b"))
      .withColumn("containment_pct",
        expr("(n_shared * 100) div least(n_fp_a, n_fp_b)"))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_fp_a"),
        col("n_fp_b"), col("containment_pct"))
  }
}
