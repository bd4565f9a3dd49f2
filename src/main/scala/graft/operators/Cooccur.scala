package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Adjacent-token co-occurrence statistics (the collocation-mining step
  * of corpus analysis, Church & Hanks 1990): bigram counts joined with
  * both unigram margins plus an integer-math PMI threshold.
  *
  * PMI = log((n_xy/B) / ((n_x/N)·(n_y/N))) is never computed as a
  * float: the emitted test is `pmi >= 0 ⇔ n_xy·N² >= B·n_x·n_y`
  * (positive vs. negative association — the discriminative cut on a
  * near-random corpus), cross-multiplied in DECIMAL(38,0) — exact at
  * any corpus size below 1e38 products and replayable bit-identically
  * in any engine (the q_repetition / q_ngram_jaccard discipline).
  *
  * 100 TB shape: tokenization is the codegen kernel and runs exactly
  * TWICE over the corpus (once per count family); the margin totals N
  * and B are second-level aggregates of the vocabulary-sized count
  * tables, never separate corpus scans. Bigram and unigram counts are
  * map-side-combined hash aggregates shuffling vocabulary-sized outputs,
  * not the corpus; the two margin joins shuffle on token (AQE broadcasts
  * at small scale); N and B are single-row broadcasts (the q_bm25
  * corpus-stats pattern). Nothing driver-side.
  */
object Cooccur {

  def bigramPmi(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val tk = df.select(graft.expressions.functions.ascii_tokens(col(textCol)).as("tk"))
    val uni = tk.select(explode(col("tk")).as("w"))
    // localCheckpoint (the q_er_resolve precedent): each count table is
    // consumed by several sibling subtrees (margin joins + its total
    // rollup), and Spark's ReusedExchange does not unify them — without
    // materialization the codegen tokenizer re-scans the corpus per
    // consumer (measured: 8 scans). Checkpointing pins each table to ONE
    // corpus pass; both are vocabulary-sized, so the materialized state
    // is KBs-per-partition, not data.
    val un = uni.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    // adjacent pairs; the size guard keeps sequence() ascending (a 1-token
    // doc would otherwise produce the descending sequence(0, -1) = [0, -1])
    val bg = tk.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bn = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .localCheckpoint(true)
    // N and B as second-level rollups of the materialized count tables —
    // never separate corpus scans
    val nTok = un.agg(sum(col("n_w")).cast("long").as("n_total"))
    val bTot = bn.agg(sum(col("n_xy")).cast("long").as("b_total"))
    val d38 = DecimalType(38, 0)
    bn.filter(col("n_xy") >= minCount)
      .join(un.select(col("w").as("w1"), col("n_w").as("n_x")), Seq("w1"))
      .join(un.select(col("w").as("w2"), col("n_w").as("n_y")), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(bTot))
      .select(
        concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("n_xy"), col("n_x"), col("n_y"),
        (col("n_xy").cast(d38) * col("n_total").cast(d38) * col("n_total").cast(d38) >=
          col("b_total").cast(d38) * col("n_x").cast(d38) * col("n_y").cast(d38))
          .as("pmi_ge_0"))
  }
}
