package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boilerplate scrubbing (the CCNet / RefinedWeb "repeated lines across
  * documents" pass, at token-n-gram granularity): token positions covered
  * by any n-gram that recurs in at least `minDocs` DISTINCT documents are
  * removed, and the surviving tokens are re-joined in order. Headers,
  * cookie banners, and navigation chrome recur verbatim across pages;
  * body prose does not — dropping cross-document-frequent n-grams is the
  * standard pretraining scrub when line boundaries are unavailable.
  *
  * Integer-only semantics (count thresholds, position arithmetic, ordered
  * reassembly) so any engine replays it bit-identically.
  *
  * 100 TB shape: the codegen tokenizer runs a CONSTANT number of corpus
  * passes (one inside the frequent-set checkpoint build, then one each
  * for the coverage join, the token stream, and the report spine —
  * asserted in BoilerplateSpec), never per-consumer: the frequent set is
  * localCheckpoint-pinned because it is vocabulary-sized, while the gram
  * and token streams are corpus-sized and deliberately recomputed rather
  * than materialized. The coverage semi-join shuffles (id, position)
  * pairs only, and reassembly is one shuffle on the document id. The
  * per-document position explode is O(doc tokens) — pathological
  * documents should be pre-split (see [[Dedup.duplicateSpans]]'s note).
  */
object Boilerplate {

  /** Per-document scrub report: original token count, removed token
    * count, and the scrubbed text (surviving tokens joined by one
    * space). Documents with NULL `textCol` are dropped.
    */
  def scrubFrequentNgrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Long): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (1 would scrub everything), got $minDocs")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.expressions.functions.ascii_tokens(col(textCol)).as("tk"))
    // (id, i, w): every token with its 0-based position
    val toks = base.select(col("id"),
        posexplode(col("tk")).as(Seq("i", "w")))
    // (id, i, gram): every n-gram occurrence anchored at its start
    val grams = base.filter(size(col("tk")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(0, size(tk) - $n), i -> struct(i AS i, " +
          s"concat_ws(' ', slice(tk, i + 1, $n)) AS gram))")).as("g"))
      .select(col("id"), col("g.i").as("i"), col("g.gram").as("gram"))
    // frequent set: grams recurring across >= minDocs distinct documents
    // (vocabulary-sized; the count is over ids, never raw occurrences,
    // so a gram repeated inside ONE document is not boilerplate)
    val frequent = grams.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("gram"))
      // vocabulary-sized: pin it so the coverage join consumes the
      // materialized set instead of re-running the whole corpus
      // aggregate inside its subtree (the Cooccur trap)
      .localCheckpoint(true)
    // covered positions: each frequent occurrence claims [i, i+n)
    val covered = grams.join(frequent, Seq("gram"), "left_semi")
      .select(col("id"), explode(sequence(col("i"), col("i") + lit(n - 1))).as("i"))
      .distinct()
    val kept = toks.join(covered, Seq("id", "i"), "left_anti")
    val scrubbed = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(i, w))), s -> s.w)"), " ")
          .as("scrubbed_text"))
    base.select(col("id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(scrubbed, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_scrubbed"),
        coalesce(col("scrubbed_text"), lit("")).as("scrubbed_text"))
  }

  /** Bigram-familiarity quality score (a language-model perplexity proxy
    * without floats): the fraction of a document's adjacent-token bigrams
    * that are "familiar" — i.e. occur at least `minCount` times in the
    * whole corpus. Fluent prose repeats the corpus's common transitions;
    * gibberish and mojibake do not. Emitted as the integer pair
    * (n_bigrams, n_familiar) plus the cross-multiplied majority test
    * `2·n_familiar >= n_bigrams` — never a float ratio.
    *
    * 100 TB shape: the corpus bigram-count table is vocabulary-sized,
    * built map-side-combined, and localCheckpoint-pinned, so the
    * tokenizer runs a CONSTANT three corpus passes (familiar-set build,
    * per-document join side, report spine — asserted in BoilerplateSpec),
    * never per-consumer. Per-document bigrams join the familiar set on
    * the gram (AQE broadcasts it at small scale), then one shuffle on
    * the document id for the rollup.
    */
  def bigramFamiliarity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.expressions.functions.ascii_tokens(col(textCol)).as("tk"))
    val bg = base.select(col("id"),
      explode(graft.expressions.functions.word_bigrams(col("tk"))).as("gram"))
    val familiar = bg.groupBy(col("gram")).agg(count(lit(1)).as("n_g"))
      .filter(col("n_g") >= minCount)
      .select(col("gram"), lit(1L).as("fam"))
      // vocabulary-sized: pin it (the Cooccur trap — see scrubFrequentNgrams)
      .localCheckpoint(true)
    val perDoc = bg.join(familiar, Seq("gram"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum(col("fam")), lit(0L)).as("n_familiar"))
    base.select(col("id"))
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_familiar"), lit(0L)).as("n_familiar"),
        (coalesce(col("n_familiar"), lit(0L)) * 2 >=
          coalesce(col("n_bigrams"), lit(0L))).as("familiar_majority"))
  }

  /** Top-k terms per document by tf-idf, ranked on an EXACT integer sort
    * key: `(tf · n_docs · 1_000_000) div df` — monotone in the true
    * tf·idf = tf·(N/df) ordering for fixed tf scale, and bit-identical
    * in any engine (integer floor-division; no float log). Ties break on
    * the term string, so the cut is total.
    *
    * PRECONDITION (the NaN-precondition discipline of [[Stats]]): the
    * key is 64-bit, so `tf · n_docs` must stay below 9.2e12 — that holds
    * for a billion-document corpus until a single document repeats one
    * term ~9,200 times. Beyond that, engines diverge (Spark's non-ANSI
    * long multiply wraps, strict engines raise): shrink the 1e6 scale or
    * move the key to DECIMAL(38,0) before pointing this at such a corpus.
    *
    * 100 TB shape: one tokenize pass → (id, term, tf) hash aggregate
    * (corpus-token shuffle, map-side combined); the df table is a
    * second-level rollup of that aggregate (vocabulary-sized, joined on
    * term — broadcast at small scale); n_docs is a single-row broadcast
    * (the q_bm25 corpus-stats pattern); the final per-document top-k is
    * a WindowGroupLimit on the id shuffle.
    */
  def tfidfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.expressions.functions.ascii_tokens(col(textCol)).as("tk"))
    val tf = base.select(col("id"), explode(col("tk")).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // feeds df + nDocs + the ranked join: one pass
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(countDistinct(col("id")).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_key").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"), col("tf"), col("df"),
        expr("(tf * n_docs * 1000000L) div df").as("score_key"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .withColumnRenamed("id", idCol)
  }
}
