package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Bigram language-model scoring without floats — the perplexity-style
  * quality filter of pretraining pipelines (CCNet / Gopher lineage:
  * docs whose transitions the corpus LM finds improbable are OCR junk,
  * shuffled text, or wrong-language) rendered in the repo's
  * integer-cross-multiplication discipline so the DuckDB oracle replays
  * every decision exactly.
  *
  * Model: add-one-smoothed conditional p(w2|w1) = (c12+1)/(c1+V) over
  * adjacent lowercase-[a-z0-9]+ token bigrams. Instead of summing float
  * logs (engine-ulp territory, never emitted per the q_cooccur_pmi /
  * BM25 law), each doc gets an exact SURPRISE-BAND HISTOGRAM: for band
  * multiple m, the count of its bigrams with p(w2|w1) below 1/(m·V) —
  * i.e. below 1/m of the uniform share — decided by the integer test
  *
  *     (c12 + 1) · m · V  <  c1 + V.
  *
  * A doc whose transitions hug the corpus distribution lands few counts
  * in the m=1 band; shuffled or foreign text lands most of them. The
  * emitted majority flag (2·band1 ≥ n_bigrams) is the binary filter.
  *
  * Scale shape: the MODEL tables are vocab-bounded — c12 is one
  * groupBy over the bigram stream (|V|² rows max), c1 is |V| rows, V is
  * a scalar — and all three join back BROADCAST, so the corpus-sized
  * bigram stream never hash-shuffles; the only data-sized exchange is
  * the final per-doc groupBy on doc_id. At a real 100 TB vocabulary the
  * c12 broadcast becomes a shuffle join on (w1,w2) — one line to flip —
  * while c1/V stay broadcast; everything else is unchanged.
  */
object NgramLm {

  /** Per-doc surprise profile: `(idCol, n_bigrams, n_below_u,
    * n_below_u2, mostly_surprising)`. Docs with fewer than two tokens
    * keep a row with zero counts (left join from the doc spine), so the
    * output is total over the input.
    */
  def surpriseProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), gfn.ascii_tokens(col(textCol)).as("tk"))
    val bigrams = toks
      .filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(tk)-2), i -> struct(tk[i] as w1, tk[i+1] as w2))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val vRow = bigrams.agg(countDistinct(col("w2")).as("v"))
    val scored = bigrams
      .join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vRow))
    def below(m: Int) =
      sum(when((col("n12") + 1) * m * col("v") < col("n1") + col("v"), 1L)
        .otherwise(0L)).as(s"n_below_u${if (m == 1) "" else m.toString}")
    val perDoc = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"), below(1), below(2))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_below_u"), lit(0L)).as("n_below_u"),
        coalesce(col("n_below_u2"), lit(0L)).as("n_below_u2"))
      .withColumn("mostly_surprising", col("n_below_u") * 2 >= col("n_bigrams"))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public): score every
    * candidate document by how its bigrams' likelihood under a TARGET-
    * domain LM compares to the general-corpus LM, and keep the docs the
    * target model favors. The published method thresholds the summed
    * log-likelihood ratio; rendered here in the no-float-logs
    * discipline, each bigram's ratio test
    *
    *     p_t(w2|w1) ≥ p_c(w2|w1)
    *     ⟺ (c12_t+1)·(c1_c+V_c) ≥ (c12_c+1)·(c1_t+V_t)
    *
    * is an exact integer cross-multiplication (both sides add-one-
    * smoothed), and a doc is kept when a majority of its bigrams favor
    * the target — the sign-aggregated variant of the LLR sum, exactly
    * replayable by any engine.
    *
    * Scale shape: both models are vocab-bounded broadcast tables (the
    * same c12/c1/V shape as [[surpriseProfile]]); candidate bigrams
    * join them broadcast and aggregate per doc — one data-sized
    * exchange (the per-doc groupBy), everything else model-sized.
    */
  def dsirSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    val base = docs.withColumn("__t", isTarget)
    def bigramsOf(df: DataFrame, keep: Seq[String]): DataFrame = df
      .withColumn("tk", gfn.ascii_tokens(col(textCol)))
      .filter(size(col("tk")) >= 2)
      .select(keep.map(col) :+ explode(expr(
        "transform(sequence(0, size(tk)-2), i -> struct(tk[i] as w1, tk[i+1] as w2))")).as("b"): _*)
      .select(keep.map(col) :+ col("b.w1").as("w1") :+ col("b.w2").as("w2"): _*)
    def model(df: DataFrame, suffix: String): (DataFrame, DataFrame, DataFrame) = {
      val b = bigramsOf(df, Seq.empty)
      (b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as(s"n12_$suffix")),
        b.groupBy(col("w1")).agg(count(lit(1)).as(s"n1_$suffix")),
        b.agg(countDistinct(col("w2")).as(s"v_$suffix")))
    }
    val (t12, t1, tv) = model(base.filter(col("__t")), "t")
    val (c12, c1, cv) = model(base.filter(!col("__t")), "c")
    val cand = bigramsOf(base.filter(!col("__t")), Seq(idCol))
      .join(broadcast(t12), Seq("w1", "w2"), "left")
      .join(broadcast(t1), Seq("w1"), "left")
      .join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(tv)).crossJoin(broadcast(cv))
      .withColumn("fav",
        (coalesce(col("n12_t"), lit(0L)) + 1L) * (col("n1_c") + col("v_c")) >=
          (col("n12_c") + 1L) * (coalesce(col("n1_t"), lit(0L)) + col("v_t")))
    val perDoc = cand.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("fav"), 1L).otherwise(0L)).as("n_target_favored"))
    base.filter(!col("__t")).select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_target_favored"), lit(0L)).as("n_target_favored"))
      .withColumn("dsir_keep", col("n_target_favored") * 2 >= col("n_bigrams"))
  }

  /** Top-p (nucleus) cutoff per context — the sampling-time vocabulary
    * truncation of LLM decoding (Holtzman et al. 2020, public) computed
    * over the corpus bigram model: for each context w1 with at least
    * `minCount` transitions, successors ordered by (count desc, token
    * asc) are kept while the cumulative count BEFORE a row is still
    * under pNum/pDen of the context total — the minimal prefix whose
    * mass reaches p, decided by the integer test cum_prev·pDen <
    * n1·pNum. `covered_ok` (cumulative mass at the cut ≥ p·n1, again by
    * cross-multiplication) is a structural certificate: it holds by
    * construction, so a false anywhere means the cumsum itself drifted.
    *
    * Scale shape: all frames here are MODEL-sized — c12 has at most |V|²
    * rows and the per-context window holds ≤ |V| successors — so the
    * per-context ordering window is domain-bounded by vocabulary, never
    * by corpus volume; only the bigram count groupBy touches data scale.
    */
  def nucleus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 50L,
      pNum: Int = 9,
      pDen: Int = 10): DataFrame = {
    require(pNum > 0 && pDen > pNum, s"need 0 < pNum < pDen, got $pNum/$pDen")
    val toks = docs.select(col(idCol), gfn.ascii_tokens(col(textCol)).as("tk"))
    val bigrams = toks
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk)-2), i -> struct(tk[i] as w1, tk[i+1] as w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
      .filter(col("n1") >= minCount)
    val ordW = Window.partitionBy(col("w1"))
      .orderBy(col("n12").desc, col("w2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c12.join(broadcast(c1), Seq("w1"))
      .withColumn("cum", sum(col("n12")).over(ordW))
      .withColumn("kept", (col("cum") - col("n12")) * pDen < col("n1") * pNum)
      .groupBy(col("w1"))
      .agg(max(col("n1")).as("n1"),
        count(lit(1)).as("n_succ"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nucleus_size"),
        max(when(col("kept"), col("cum"))).as("cov_cut"))
      .withColumn("covered_ok", col("cov_cut") * pDen >= col("n1") * pNum)
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman's interpolated form) with absolute discount d = ¾ —
    * THE classical n-gram smoother, rendered float-free: with the
    * discount a quarter-integer, p_KN(w₂|w₁) = (c₁₂−¾)⁺/c₁ +
    * (¾·N₁₊(w₁·)/c₁)·(N₁₊(·w₂)/N₁₊(··)) multiplies out to the single
    * exact rational ((4c₁₂−3)⁺·B + 3·nf₁·nb₂) / (4·c₁·B) (B = distinct
    * bigram count), emitted ×10⁶ by one truncating division next to
    * the MLE ×10⁶ — the continuation-probability correction ("Francisco
    * is frequent but only ever follows San") visible as the gap
    * between the two columns. Model frames are vocabulary-bounded
    * (c₁₂ ≤ |V|², margins |V|); emitted for the top-K bigrams by the
    * deterministic (count desc, w₁, w₂) order. Products ride
    * DECIMAL(38,0), loud past c₁·B ≈ 10³⁷.
    */
  def kneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1 && topK <= 10000, s"topK out of range: $topK")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val b = docs
      .withColumn("tk", gfn.ascii_tokens(col(textCol)))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk)-2), i -> struct(tk[i] as w1, tk[i+1] as w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // margins, fan-outs, and B all fold off it
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"),
      count(lit(1)).as("nf1"))
    val nb2 = c12.groupBy(col("w2")).agg(count(lit(1)).as("nb2"))
    val bTot = c12.agg(count(lit(1)).as("n_bigram_types"))
    c12.orderBy(col("c12").desc, col("w1").asc, col("w2").asc).limit(topK)
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(nb2), Seq("w2"))
      .crossJoin(broadcast(bTot))
      .withColumn("pkn_x1e6", expr(
        """(1000000 * (greatest(4 * c12 - 3, 0) * CAST(n_bigram_types AS DECIMAL(38,0))
              + CAST(3 AS DECIMAL(38,0)) * nf1 * nb2))
           div (CAST(4 AS DECIMAL(38,0)) * c1 * n_bigram_types)"""))
      .withColumn("pmle_x1e6", expr("(1000000 * c12) div c1"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("nf1"),
        col("nb2"), col("n_bigram_types"), col("pkn_x1e6"), col("pmle_x1e6"))
  }
}
