package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Text-analysis operators for training-data pipelines over a `documents`
  * table (`doc_id, text, lang, source, n_chars`). Every operator is a pure
  * Column expression — narrow (no shuffle), codegen'd, scan-fused — so at
  * 100 TB each is a single pass over the text column with full column
  * pruning (`ReadSchema` carries only `text` + keys).
  */
object TextAnalysis {

  /** Whitespace token count; 0 for empty/blank text. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword-ish token count: GPT-2-style pretokenizer regex classes
    * (word pieces, numbers, punctuation runs) counted with `regexp_count`.
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")).cast("long")

  /** Quality-scoring feature columns. All ratios are guarded against
    * zero-length text.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val safeLen = when(len === 0, lit(1.0d)).otherwise(len)
    val nTokens = tokenCountWs(text).cast("double")
    val safeTokens = when(nTokens === 0, lit(1.0d)).otherwise(nTokens)
    Seq(
      "n_chars_q"      -> length(text).cast("long"),
      "n_tokens"       -> tokenCountWs(text),
      "alpha_ratio"    -> (regexp_count(text, lit("[A-Za-z]")).cast("double") / safeLen),
      "digit_ratio"    -> (regexp_count(text, lit("[0-9]")).cast("double") / safeLen),
      "punct_ratio"    -> (regexp_count(text, lit("[!-/:-@\\[-`{-~]")).cast("double") / safeLen),
      "space_ratio"    -> (regexp_count(text, lit("\\s")).cast("double") / safeLen),
      "mean_token_len" -> (regexp_count(text, lit("\\S")).cast("double") / safeTokens),
      "upper_ratio"    -> (regexp_count(text, lit("[A-Z]")).cast("double") / safeLen))
  }

  /** Composite [0,1] quality score: documents that look like prose (mostly
    * alphabetic, moderate punctuation, reasonable token length) score high.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = least(f("n_tokens").cast("double") / lit(20.0d), lit(1.0d))
    val alphaScore = f("alpha_ratio")
    val punctPenalty = greatest(lit(0.0d), lit(1.0d) - f("punct_ratio") * 4.0d)
    round((lenScore * 0.3d + alphaScore * 0.5d + punctPenalty * 0.2d), 4)
  }

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deterministic, dependency-free; the point is the
    * distributed shape (argmax over per-language overlap counts computed in
    * one pass), not lexicon quality.
    */
  private[graft] val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "as", "was",
      "on", "are", "this", "be", "by", "at", "have", "from"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "zu", "den",
      "von", "für", "auf", "im", "des", "sich", "dem", "als", "auch"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que", "dans", "pour",
      "qui", "sur", "pas", "au", "avec", "ce", "il", "sont"),
    "es" -> Seq("el", "la", "y", "los", "las", "es", "un", "una", "del", "que", "en", "por",
      "para", "con", "no", "se", "su", "al", "lo", "como"))

  /** Language-ID: lowercase-tokenize once, count stopword hits per language
    * with `filter` over the token array, take the argmax (ties → "und").
    * One narrow pass; the lexicons are plan literals, no join needed.
    */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "[^\\p{L}]+")
    val scores = stopwords.map { case (lang, words) =>
      val set = array(words.map(lit): _*)
      lang -> size(filter(tokens, t => array_contains(set, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Per-language stopword hit counts — langId's scores, exposed: one
    * (lang, count) column per lexicon from ONE tokenize pass. The raw
    * material of code-switching / language-mixing detection (a document
    * hitting two lexicons hard is mixed — or mislabeled).
    */
  def stopwordCounts(text: Column): Seq[(String, Column)] = {
    val tokens = split(lower(text), "[^\\p{L}]+")
    stopwords.map { case (lang, words) =>
      val set = array(words.map(lit): _*)
      lang -> size(filter(tokens, t => array_contains(set, t))).cast("long")
    }
  }

  /** Rolling polynomial document fingerprint: base-31 recurrence over the
    * code points of the ASCII-printable, whitespace-normalized text, reduced
    * mod 1e9+7 at every step. The modulus keeps intermediate values far from
    * 64-bit overflow, so the SAME arithmetic is expressible in engines with
    * checked overflow (DuckDB raises where the JVM would silently wrap) —
    * that is what makes this oracle-verifiable. Stable across runs and
    * partitions (pure expression, no RNG).
    */
  def fingerprint(text: Column): Column = {
    val asciiOnly = regexp_replace(text, "[^ -~]", "")
    val norm = regexp_replace(trim(asciiOnly), "\\s+", " ")
    val chars = split(norm, "")
    aggregate(
      filter(chars, c => length(c) > 0),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c).cast("long"), lit(1000000007L)))
  }

  /** Text normalization for training corpora: lowercase, strip
    * non-alphanumerics, drop stopwords (all four lexicons), re-join with
    * single spaces. One narrow codegen'd pass; the lexicons are plan
    * literals.
    */
  def cleanText(text: Column): Column = {
    val all = stopwords.flatMap(_._2).distinct
    val stopSet = array(all.map(lit): _*)
    val tokens = split(lower(text), "[^a-z0-9]+")
    array_join(
      filter(tokens, t => length(t) > 0 && !array_contains(stopSet, t)),
      " ")
  }

  /** PII patterns shared verbatim with the DuckDB oracle — kept in the
    * RE2 ∩ Java regex common subset (no lookarounds, no backrefs).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrub for training corpora: mask emails, IPv4 addresses, and
    * phone-shaped digit runs with typed placeholders. Three codegen'd
    * `regexp_replace` passes (email first — it contains digits and dots
    * the later patterns would otherwise bite into). Narrow, zero shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Corpus-level document-frequency cut (the boilerplate-removal shape of
    * RefinedWeb/C4-style cleaning, applied at token granularity): drop
    * every token appearing in at least `maxDocFrac` of the documents,
    * preserving each document's remaining token ORDER.
    *
    * Distributed shape: TWO scan+explode passes over the corpus — the
    * hot-token set must be complete before any document can be rebuilt,
    * and caching the exploded tokens at 100 TB would cost more memory
    * than a second scan costs I/O. Pass 1 feeds the doc-frequency
    * aggregate (two-level distinct count on (token, id), partial-
    * aggregated, shuffle keyed by token); pass 2 anti-joins the
    * (small, broadcast) hot-token set and regroups by id carrying
    * (pos, token) pairs — the only corpus-wide shuffle — re-sorting per
    * document. Plus one O(1) count job for the doc total. Documents
    * whose every token is boilerplate drop out entirely (same as the
    * SQL formulation).
    */
  def dfCut(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFrac: Double = 0.8): DataFrame = {
    val nDocs = df.count() // scalar, O(1) driver-side
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val hot = toks.groupBy(col("tok"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= lit(maxDocFrac * nDocs))
      .select("tok")
    toks.join(broadcast(hot), Seq("tok"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")), " ").as("cleaned"))
      .withColumnRenamed("id", idCol)
  }

  /** Word-bigram repetition stats — the standard repetition filter of
    * training-data curation (boilerplate and generated spam have low
    * distinct-bigram ratios). Outputs are INTEGERS (counts), not a
    * rounded ratio: a ratio can tie at the rounding digit where Spark
    * (HALF_UP) and an oracle engine (HALF_EVEN) disagree, while integer
    * arithmetic hashes exactly; thresholds compare cross-multiplied
    * (n_distinct * 10 <= n_bigrams * 8 is "ratio <= 0.8" exactly).
    * One narrow codegen projection per row — no shuffle, no explode.
    */
  /** Word bigrams of a pre-split token column. element_at is 1-based in
    * both Spark and the DuckDB oracle's t[i]; the size guard matters:
    * Spark's sequence(1, 0) counts DOWN.
    */
  private def bigramsOf(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Drop repetitive rows with the one-pass kernel verdict
    * (`bigram_repetitive`, same semantics as [[bigramRepetition]]'s
    * boolean; kernel agreement pinned in BigramRefSpec). A Column-DSL
    * formulation of the verdict is a trap: higher-order functions are
    * excluded from subexpression elimination AND a filter pushed through
    * any staging projection re-fuses the expression, re-running the
    * lambda per reference — measured ~30x slower than the kernel.
    */
  def dropRepetitive(df: DataFrame, textCol: String): DataFrame =
    df.filter(!gfn.bigram_repetitive(col(textCol)))

  def bigramRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Pure Column DSL (no SQL-string interpolation — column names with
    // spaces/dots resolve through the same col() path as everywhere else).
    df.select(col(idCol), split(col(textCol), " ").as("__tk"))
      .select(col(idCol), bigramsOf(col("__tk")).as("bg"))
      .select(col(idCol),
        size(col("bg")).as("n_bigrams"),
        size(array_distinct(col("bg"))).as("n_distinct"))
      .withColumn("is_repetitive",
        col("n_bigrams") > 0 && col("n_distinct") * 10 <= col("n_bigrams") * 8)
  }

  /** All analyses as one DataFrame transform (single narrow projection). */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val features = qualityFeatures(t)
    features.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
      .withColumn("n_tokens_bpe", tokenCountBpe(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Vocabulary build: the top `size` corpus tokens by frequency
    * (freq-desc, token-asc — fully deterministic ids 1..size). The final
    * ranking window runs single-partition over the DISTINCT-token table —
    * already reduced by a map-side-combined count; for web-scale vocab
    * cut the tail with a freq floor first, the ranking itself is O(vocab).
    */
  def buildVocab(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token").asc)
    docs.select(explode(split(col(textCol), " ")).as("token"))
      // split() manufactures "" around doubled/leading/trailing spaces —
      // a phantom token that could otherwise claim a top vocabulary slot;
      // encodeTokens keeps those positions and maps them to OOV (0)
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("token_id", row_number().over(w).cast("long"))
      .filter(col("token_id") <= size)
      .select("token", "token_id")
  }

  /** Encode documents against a [[buildVocab]] dictionary as long-format
    * (id, pos, token_id) with OOV → 0 — the id-mapping step before
    * sequence packing. The vocab broadcasts (bounded by `size`); the
    * explode is narrow; nothing else shuffles.
    */
  def encodeTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))

  /** Gopher-style document-quality rules (Rae et al. 2021, "Scaling
    * Language Models", App. A1.1 — public) rendered as EXACT integer
    * tests so every verdict is oracle-replayable: word-count window,
    * mean-word-length window by cross-multiplication (lo·n ≤ chars ≤
    * hi·n — never a float division), a stopword-presence floor over the
    * paper's 8-word list, and the duplicate-fraction rule as the
    * 2·distinct ≥ total majority test. Thresholds are pinned to this
    * corpus's measured quantiles so each rule genuinely splits it
    * (word count p10=21/median 56/p90=88; mean word length 3.7–5.3;
    * the/a present in ~77% of docs; TTR median 0.46) — data-dependent
    * constants in the q_bigram_familiarity tradition: re-pin, don't
    * debug, if the generator changes. Pure column expressions — one
    * narrow pass, no shuffle, scan-fused at any scale.
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val tk = gfn.ascii_tokens(text)
    val nWords = size(tk).cast("long")
    val nAlnum = length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("long")
    val stopwords = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val nStop = size(array_intersect(array_distinct(tk), stopwords)).cast("long")
    val nDistinct = size(array_distinct(tk)).cast("long")
    Seq(
      "n_words" -> nWords,
      "n_alnum_chars" -> nAlnum,
      "n_distinct_words" -> nDistinct,
      "n_stopwords" -> nStop,
      "rule_word_count" -> (nWords >= 30L && nWords <= 90L),
      "rule_word_length" -> (nAlnum >= nWords * 4L && nAlnum <= nWords * 5L),
      "rule_stopwords" -> (nStop >= 2L),
      "rule_repetition" -> (nDistinct * 2L >= nWords))
  }

  /** Longest run of identical consecutive tokens per document — the
    * degeneration/repetition-loop detector ("the the the …" from broken
    * extraction or model-generated loops; the max-run complement to
    * [[bigramRepetition]]'s duplicate-fraction). Classic gaps-and-
    * islands: run boundaries where the token differs from its
    * predecessor, run ids by cumsum, then per-run lengths — every
    * window PARTITIONED BY DOCUMENT (keyed parallelism, partition cost
    * bounded by one doc's length, never corpus size). The per-doc
    * champion is one struct-min `(−len, token, start)` — longest run,
    * token-asc then earliest-start tiebreaks — a total order both
    * engines share.
    *
    * Emits `(idCol, n_tokens, n_runs, max_run, run_token, run_start)`;
    * docs with zero tokens are absent (identically in any replay).
    */
  def tokenRuns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol), posexplode(gfn.ascii_tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val runs = toks
      .withColumn("new_run",
        when(lag(col("tok"), 1).over(w).isNull ||
          lag(col("tok"), 1).over(w) =!= col("tok"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("new_run"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("run_id"))
      .agg(min(col("tok")).as("tok"), // constant within a run
        count(lit(1)).as("len"), min(col("pos")).cast("long").as("start"))
    runs.groupBy(col(idCol))
      .agg(sum(col("len")).as("n_tokens"),
        count(lit(1)).as("n_runs"),
        min(struct((-col("len")).as("nl"), col("tok").as("tok"),
          col("start").as("start"))).as("best"))
      .select(col(idCol), col("n_tokens"), col("n_runs"),
        (-col("best.nl")).as("max_run"), col("best.tok").as("run_token"),
        col("best.start").as("run_start"))
  }

  /** Per-source token-distribution drift against the REST of the corpus:
    * a token is over-represented in a source when its in-source rate
    * exceeds double its rate everywhere else, decided by exact integer
    * cross-multiplication `c_src·n_rest > 2·c_rest·n_src` (zero float
    * division — the repo's likelihood-ratio discipline). The categorical
    * complement to the numeric KS drift check: "which provenance has a
    * vocabulary unlike the others" is the question a contamination /
    * template-leak audit asks before mixing sources.
    *
    * Cross products run in DECIMAL(38,0) (DuckDB replays in HUGEINT):
    * BIGINT products of two corpus-scale counts overflow at ~3·10⁹ docs.
    * The emitted score is the per-mille rate ratio, capped at 10⁶ so the
    * `c_rest = 0` exclusive-token case stays finite and identical on
    * both engines.
    *
    * Scale shape: one token explode → one (source, token) aggregate;
    * the token-marginal and source-marginal tables re-aggregate FROM
    * that result (no second corpus pass) and broadcast (vocabulary- and
    * |sources|-sized). Nothing data-sized shuffles twice.
    */
  def sourceDrift(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      minCount: Long = 20L): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val cst = df
      .select(col(srcCol).as("source"), explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true) // feeds both marginals + the scored join
    val ct = cst.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = cst.agg(sum(col("c_st")).as("n"))
    val scored = cst
      .join(broadcast(ct), Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("c_rest", col("c_t") - col("c_st"))
      .withColumn("n_rest", col("n") - col("n_s"))
      .withColumn("over",
        col("c_st") >= minCount &&
          col("c_st").cast(dec) * col("n_rest").cast(dec) >
            col("c_rest").cast(dec) * col("n_s").cast(dec) * 2)
      // `div` (integral floor divide) — decimal `/` rounds at scale and
      // a round-then-truncate can disagree with HUGEINT floor by one
      .withColumn("__num", col("c_st").cast(dec) * col("n_rest").cast(dec) * 1000)
      .withColumn("__den", greatest(col("c_rest").cast(dec) * col("n_s").cast(dec),
        lit(1).cast(dec)))
      .withColumn("score_x1000",
        least(expr("__num div __den").cast("long"), lit(1000000L)))
    scored.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        sum(when(col("over"), 1L).otherwise(0L)).as("n_over"),
        min(when(col("over"),
          struct((-col("score_x1000")).as("ns"), col("tok").as("tok")))).as("best"))
      .select(col("source"), col("n_tokens"), col("n_over"),
        col("best.tok").as("top_token"), (-col("best.ns")).as("top_score_x1000"))
  }

  /** χ² token–category association (the classic feature-selection
    * statistic; Manning & Schütze ch. 5): for every (category, token)
    * pair the 2×2 document-frequency table (a = docs in category with
    * token, b = other docs with token, c/d = the complements) scored as
    * χ²·1000 = 1000·N·(ad−bc)² div ((a+b)(c+d)(a+c)(b+d)) — EXACT
    * integer emission, products in DECIMAL(38,0), LOUD past the exact
    * bound: |ad−bc| ≤ N²/4, so the numerator tops out at 1000·N⁵/16,
    * which fits 38 digits only up to N = 10⁷ docs — beyond that a
    * raise_error fires (the passAtK discipline) instead of Spark's
    * silent precision-loss null. Larger corpora should chi2 per shard
    * (the statistic is shard-additive in its marginal inputs). A
    * zero denominator (token in every doc, or single-category corpus)
    * emits 0 — the statistic is undefined and "no signal" is the only
    * portable rendering.
    *
    * `catCol` must PARTITION the documents (one category per doc —
    * a language/source/label column): that is what lets every marginal
    * re-aggregate from the single (cat, token) doc-frequency table
    * (df_tot = Σ_cat a; N = Σ_cat n_cat) instead of re-scanning the
    * corpus — ONE data-sized distinct + ONE aggregate total, the
    * sourceDrift discipline. The marginal tables are vocabulary/
    * |categories|-sized broadcasts.
    */
  /** Largest corpus size N for which 1000·N·(ad−bc)² provably fits
    * DECIMAL(38,0): 1000·N⁵/16 ≤ 10³⁸ ⟺ N ≤ ~1.7·10⁷; 10⁷ kept as the
    * round safe bound.
    */
  private val ChiSqMaxN = 10000000L

  def chi2TokenAssoc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      catCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val dfl = df
      .select(col(catCol).as("cat"), col(idCol).as("__id"),
        explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .distinct()
      .groupBy(col("cat"), col("tok")).agg(count(lit(1)).as("a"))
      .localCheckpoint(true) // feeds the score join + both marginals
    val nCat = df.groupBy(col(catCol).as("cat"))
      .agg(countDistinct(col(idCol)).as("n_cat"))
    val nTot = nCat.agg(sum(col("n_cat")).as("n"))
    val dft = dfl.groupBy(col("tok")).agg(sum(col("a")).as("df_tot"))
    dfl
      .join(broadcast(dft), Seq("tok"))
      .join(broadcast(nCat), Seq("cat"))
      .crossJoin(broadcast(nTot))
      .withColumn("b", col("df_tot") - col("a"))
      .withColumn("c", col("n_cat") - col("a"))
      .withColumn("d", col("n") - col("n_cat") - col("b"))
      .withColumn("__den",
        col("df_tot").cast(dec) * (col("n") - col("df_tot")).cast(dec) *
          col("n_cat").cast(dec) * (col("n") - col("n_cat")).cast(dec))
      .withColumn("__crs",
        col("a").cast(dec) * col("d").cast(dec) -
          col("b").cast(dec) * col("c").cast(dec))
      .withColumn("chi2_x1000",
        when(col("n") > ChiSqMaxN, raise_error(concat(
          lit(s"chi2TokenAssoc: N exceeds exact-decimal bound $ChiSqMaxN (N="),
          col("n").cast("string"), lit(")"))).cast("long"))
          .when(col("__den") === 0, 0L)
          .otherwise(
            expr("(1000 * CAST(n AS DECIMAL(38,0)) * __crs * __crs) div __den")
              .cast("long")))
      .select(col("cat"), col("tok"), col("a").as("df_cat"), col("df_tot"),
        col("n_cat"), col("chi2_x1000"))
  }

  /** Token burstiness (Church & Gale 1995): collection frequency over
    * document frequency per token, per-mille — a bursty token (cf ≫ df)
    * concentrates in few documents (names, boilerplate, spam markers),
    * a flat one spreads evenly (function words). The signal behind
    * burstiness-aware stopword and spam lexicons. One explode, one
    * (token) aggregate computing cf and df together from (doc, token)
    * rows; `minDf` floors out the unstable tail.
    */
  /** Flesch reading-ease (1948), the curriculum/quality-binning
    * readability score, ALL-INTEGER: sentences = non-blank [.!?]+
    * fragments, words = ascii tokens, syllables = [aeiouy]+ vowel
    * groups per word (the standard machine approximation), and
    * `flesch_x1000` = 206835 − (1015·W) div S − (84600·Syl) div W —
    * floor-composed, so both engines render the identical integer; 0
    * when W or S is 0 (blank doc). Pure per-row projection: zero
    * shuffles, whole-stage codegen, trivially 100 TB-safe.
    */
  def fleschReadability(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    df
      .withColumn("__tk", gfn.ascii_tokens(col(textCol)))
      .withColumn("n_sents",
        size(filter(split(col(textCol), "[.!?]+"), x => length(trim(x)) > 0))
          .cast("long"))
      .withColumn("n_words", size(col("__tk")).cast("long"))
      .withColumn("n_syllables", expr(
        """aggregate(transform(__tk, w -> size(regexp_extract_all(w, '[aeiouy]+', 0))),
           CAST(0 AS BIGINT), (a, b) -> a + CAST(b AS BIGINT))"""))
      .withColumn("flesch_x1000",
        when(col("n_words") === 0 || col("n_sents") === 0, 0L).otherwise(
          lit(206835L) - expr("(1015 * n_words) div n_sents")
            - expr("(84600 * n_syllables) div n_words")))
      .select(col(idCol) +: (keepCols ++ Seq("n_sents", "n_words",
        "n_syllables", "flesch_x1000")).map(col): _*)

  /** Gunning fog index (1952), Flesch's grade-level sibling with a
    * different hard-word notion: fog·1000 = (400·W) div S +
    * (40000·C) div W with C = words of ≥3 vowel groups (the machine
    * rendering of "complex"). Same floor-composed integer discipline
    * and zero-shuffle projection shape as [[fleschReadability]].
    */
  def gunningFog(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    df
      .withColumn("__tk", gfn.ascii_tokens(col(textCol)))
      .withColumn("n_sents",
        size(filter(split(col(textCol), "[.!?]+"), x => length(trim(x)) > 0))
          .cast("long"))
      .withColumn("n_words", size(col("__tk")).cast("long"))
      .withColumn("n_complex", expr(
        """aggregate(transform(__tk,
             w -> CASE WHEN size(regexp_extract_all(w, '[aeiouy]+', 0)) >= 3
                  THEN 1 ELSE 0 END),
           CAST(0 AS BIGINT), (a, b) -> a + CAST(b AS BIGINT))"""))
      .withColumn("fog_x1000",
        when(col("n_words") === 0 || col("n_sents") === 0, 0L).otherwise(
          expr("(400 * n_words) div n_sents")
            + expr("(40000 * n_complex) div n_words")))
      .select(col(idCol) +: (keepCols ++ Seq("n_sents", "n_words",
        "n_complex", "fog_x1000")).map(col): _*)

  /** Coleman–Liau index (1975), the readability member that needs NO
    * syllable heuristic — characters and sentences only, which makes
    * it the robust cross-checking sibling of [[fleschReadability]] /
    * [[gunningFog]] on noisy web text where vowel-group counting
    * misfires: CLI = 5.88·(letters/words) − 29.6·(sentences/words)
    * − 15.8, rendered floor-composed as `cli_x1000` = (5880·L) div W
    * − (29600·S) div W − 15800. Letters = ascii-token character mass
    * (the tokenizer already strips punctuation). Same zero-shuffle
    * projection shape as the siblings.
    */
  def colemanLiau(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    df
      .withColumn("__tk", gfn.ascii_tokens(col(textCol)))
      .withColumn("n_sents",
        size(filter(split(col(textCol), "[.!?]+"), x => length(trim(x)) > 0))
          .cast("long"))
      .withColumn("n_words", size(col("__tk")).cast("long"))
      .withColumn("n_letters", expr(
        """aggregate(transform(__tk, w -> length(w)),
           CAST(0 AS BIGINT), (a, b) -> a + CAST(b AS BIGINT))"""))
      .withColumn("cli_x1000",
        when(col("n_words") === 0 || col("n_sents") === 0, 0L).otherwise(
          expr("(5880 * n_letters) div n_words")
            - expr("(29600 * n_sents) div n_words") - lit(15800L)))
      .select(col(idCol) +: (keepCols ++ Seq("n_sents", "n_words",
        "n_letters", "cli_x1000")).map(col): _*)

  /** LIX / RIX readability (Björnsson 1968; Anderson 1983) — the
    * European members of the battery, and the only ones with NO
    * language-specific heuristic at all (no syllables, no vowel
    * groups): long words are simply ≥7 letters. LIX = W/S + 100·LW/W,
    * RIX = LW/S, rendered floor-composed as
    * `lix_x1000` = (1000·W) div S + (100000·LW) div W and
    * `rix_x1000` = (1000·LW) div S; 0 on blank docs. The useful range
    * check on multilingual corpora where [[fleschReadability]]'s
    * English vowel groups misfire hardest. Same zero-shuffle
    * projection shape as the siblings.
    */
  def lixRix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    df
      .withColumn("__tk", gfn.ascii_tokens(col(textCol)))
      .withColumn("n_sents",
        size(filter(split(col(textCol), "[.!?]+"), x => length(trim(x)) > 0))
          .cast("long"))
      .withColumn("n_words", size(col("__tk")).cast("long"))
      .withColumn("n_long", expr(
        """aggregate(transform(__tk, w -> CASE WHEN length(w) >= 7 THEN 1 ELSE 0 END),
           CAST(0 AS BIGINT), (a, b) -> a + CAST(b AS BIGINT))"""))
      .withColumn("lix_x1000",
        when(col("n_words") === 0 || col("n_sents") === 0, 0L).otherwise(
          expr("(1000 * n_words) div n_sents")
            + expr("(100000 * n_long) div n_words")))
      .withColumn("rix_x1000",
        when(col("n_sents") === 0, 0L).otherwise(
          expr("(1000 * n_long) div n_sents")))
      .select(col(idCol) +: (keepCols ++ Seq("n_sents", "n_words",
        "n_long", "lix_x1000", "rix_x1000")).map(col): _*)

  /** Function-word fingerprint (Mosteller & Wallace 1964, the
    * Federalist-papers method): per category, each fixed function
    * word's parts-per-million rate of the category's total token mass.
    * Function words are topic-free, so their profile is a stable
    * STYLE signature — the classic authorship / register / source-
    * drift fingerprint, and a cheap contamination tripwire (two
    * "independent" sources with near-identical profiles deserve a
    * look). All-integer: `ppm` = (10⁶·count) div total.
    *
    * Scale shape: one explode feeds BOTH aggregates off one pinned
    * pass — the per-(cat, word) counts are filtered to the BOUNDED
    * lexicon before the shuffle (|cats|·|lexicon| rows), and the
    * per-cat token totals broadcast back. Missing (cat, word) cells
    * densify to 0 so every category emits the FULL lexicon row set
    * (profiles align positionally across categories).
    */
  def stopwordProfile(
      df: DataFrame,
      textCol: String,
      catCol: String,
      lexicon: Seq[String] = Seq("the", "of", "and", "to", "in", "a",
        "is", "that", "it", "as", "with", "for")): DataFrame = {
    require(lexicon.nonEmpty && lexicon.distinct == lexicon,
      s"lexicon must be non-empty and duplicate-free: $lexicon")
    val toks = df
      .select(col(catCol).as("cat"), explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .localCheckpoint(true) // two consumers: lexicon counts + totals
    val totals = toks.groupBy(col("cat")).agg(count(lit(1)).as("n_tokens"))
    val lexDf = totals.sparkSession.createDataFrame(
      lexicon.map(Tuple1(_))).toDF("tok")
    val counts = toks.filter(col("tok").isin(lexicon: _*))
      .groupBy(col("cat"), col("tok")).agg(count(lit(1)).as("cnt"))
    totals.crossJoin(broadcast(lexDf)) // densify: every (cat, word) cell
      .join(counts, Seq("cat", "tok"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("ppm",
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr("(1000000 * cnt) div n_tokens")))
      .select(col("cat"), col("tok"), col("cnt"), col("n_tokens"), col("ppm"))
  }

  /** Yule's characteristic K (1944), the classic repetitiveness /
    * lexical-concentration constant: K = 10⁴·(Σ_t f_t² − N)/N² over the
    * per-category token frequency spectrum — high K = a few tokens
    * dominate (boilerplate, spam), low K = flat vocabulary. Emitted as
    * `yule_k_x1000` = (10⁷·(S₂ − N)) div N², exact in DECIMAL(38,0).
    * The loud bound sits at N = 3·10⁹ tokens per category — NOT the
    * decimal math (good to 10¹⁵) but the emitted `sum_f_sq` audit
    * column, whose worst case S₂ = N² leaves BIGINT beyond it; drop
    * that column for planetary corpora. One explode + two partial-agg
    * shuffles — the (cat, token) frequency table is the only
    * data-sized intermediate.
    */
  def yuleK(
      df: DataFrame,
      textCol: String,
      catCol: String): DataFrame = {
    val maxN = 3000000000L
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    df
      .select(col(catCol).as("cat"),
        explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .groupBy(col("cat"), col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(col("cat"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("f").cast(dec) * col("f").cast(dec)).as("__s2"))
      .withColumn("sum_f_sq",
        when(col("n_tokens") > maxN, raise_error(
          lit(s"yuleK: N exceeds exact-BIGINT audit bound $maxN")).cast("long"))
          .otherwise(col("__s2").cast("long")))
      .withColumn("yule_k_x1000",
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr(
            """(10000000 * (__s2 - CAST(n_tokens AS DECIMAL(38,0))))
               div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)""").cast("long")))
      .drop("__s2")
  }

  def tokenBurstiness(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 5L): DataFrame =
    df.select(col(idCol).as("__id"), explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("__id")).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("burst_x1000", expr("(cf * 1000) div df"))

  /** Hapax-legomena rate over token n-grams, per key: the share of the
    * key's distinct n-grams occurring exactly once — Zipf's tail mass,
    * the vocabulary-richness signal corpus linguists read (a scraped
    * source whose hapax rate collapses is template-stamped; one whose
    * rate is ~1 is near-random). Unigram hapaxes die on small closed
    * vocabularies, so the n-gram form is the useful one. One n-gram
    * explode (index-lambda transform, codegen-friendly), one
    * (key, gram) count, one per-key rollup.
    */
  def hapaxNgramRate(
      df: DataFrame,
      keyCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val gram = (0 until n).map(j => s"__tk[i+$j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    df.select(col(keyCol), gfn.ascii_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col(keyCol), explode(expr(
        s"transform(sequence(0, size(__tk)-$n), i -> $gram)")).as("gram"))
      .groupBy(col(keyCol), col("gram")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_pm", expr("(n_hapax * 1000) div n_grams"))
  }

  /** Chao1 vocabulary-richness estimate (Chao 1984, bias-corrected)
    * and Good–Turing sample coverage per key — "how much vocabulary
    * has this source NOT shown yet": Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1))
    * from the frequency spectrum's singleton/doubleton counts, and
    * coverage = 1 − f₁/N (the unseen-mass estimate). The forward-
    * looking companions to [[yuleK]]'s repeat-rate and the hapax
    * rate: they ESTIMATE the unobserved tail instead of describing
    * the observed one. `chao1_x10` by one truncating division
    * (f₁² ≤ S² rides BIGINT to ~3·10⁹ types — the yuleK audit
    * bound); empty keys emit 0. Same one token-census aggregate as
    * the siblings.
    */
  def chao1(
      df: DataFrame,
      textCol: String,
      catCol: String): DataFrame = {
    val maxTypes = 3000000000L
    df
      .select(col(catCol).as("cat"),
        explode(gfn.ascii_tokens(col(textCol))).as("tok"))
      .groupBy(col("cat"), col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(col("cat"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_x10",
        when(col("n_types") > maxTypes, raise_error(
          lit(s"chao1: type count exceeds exact bound $maxTypes")).cast("long"))
          .otherwise(col("n_types") * 10
            + expr("(10 * f1 * (f1 - 1)) div (2 * (f2 + 1))")))
      .withColumn("coverage_pm",
        when(col("n_tokens") === 0, 0L)
          .otherwise(lit(1000L) - expr("(1000 * f1) div n_tokens")))
  }

  /** Gries' Deviation of Proportions (2008) for the top-K corpus
    * terms — dispersion ACROSS parts, the axis frequency alone hides
    * (a term can be corpus-frequent yet live in one source): DP =
    * Σ_p |c_p/C − n_p/N| / 2 ∈ [0, 1), 0 = distributed exactly like
    * the part sizes, →1 = concentrated in one part. Exact by
    * cross-multiplication: dp_pm = (1000·Σ|c_p·N − n_p·C|) div
    * (2·C·N) in DECIMAL(38,0) (exact to C·N < 10³⁵ — beyond any
    * corpus). Top-K terms picked by the DETERMINISTIC (count desc,
    * term asc) order — a TakeOrderedAndProject, never a global sort —
    * then densified against the bounded part list so absent parts
    * contribute their full n_p·C mass. K·|parts| cells total.
    */
  def griesDp(
      df: DataFrame,
      textCol: String,
      partCol: String,
      topK: Int = 12): DataFrame = {
    require(topK >= 1 && topK <= 1000, s"topK out of range: $topK")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val toks = df.select(col(partCol).as("part"),
      explode(gfn.ascii_tokens(col(textCol))).as("term"))
    val cells = toks.groupBy(col("part"), col("term"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // part sizes, corpus counts, top-K all fold off it
    val partSizes = cells.groupBy(col("part")).agg(sum(col("c")).as("n_p"))
    val corpus = cells.groupBy(col("term")).agg(sum(col("c")).as("cf"))
    val top = corpus.orderBy(col("cf").desc, col("term").asc).limit(topK)
    val nTot = partSizes.agg(sum(col("n_p")).as("n_total"))
    val dense = broadcast(top).crossJoin(partSizes)
      .join(cells, Seq("part", "term"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(nTot))
    dense
      .groupBy(col("term"), col("cf"))
      .agg(max(col("n_total")).as("n_total"),
        sum(abs(col("c").cast(dec) * col("n_total")
          - col("n_p").cast(dec) * col("cf"))).as("__dev"))
      .withColumn("dp_pm",
        when(col("cf") === 0 || col("n_total") === 0, 0L).otherwise(
          ((col("__dev") * 1000 - col("__dev") * 1000
            % (col("cf").cast(dec) * col("n_total") * 2))
            / (col("cf").cast(dec) * col("n_total") * 2)).cast("long")))
      .drop("__dev")
  }
}
