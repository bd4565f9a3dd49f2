package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and chop the token stream into fixed-size context
  * windows ("concat-and-chop"), the batching step between a curated corpus
  * and a training run.
  *
  * A single global concatenation order would serialize the whole corpus
  * through one cumulative sum — a non-starter at 100 TB. Instead documents
  * are assigned to `nShards` deterministic shards (`id % nShards`) and each
  * shard packs independently: the cumulative-offset window runs per shard,
  * so the only shuffle is one hash exchange on the shard key and every
  * shard's stream is chopped in parallel. Window ids `(shard, win)` are
  * globally unique, and the per-shard order (ascending id) makes the
  * layout reproducible across runs, partitionings, and cluster sizes —
  * the property a resumable data loader needs. At cluster scale set
  * `nShards` to a small multiple of the executor count; each shard's
  * window state is one running sum, so memory is O(1) per task.
  */
object Packing {

  /** Assign each document its span in the packed token stream of its
    * shard. Offsets are half-open: a doc occupies `[start_off, end_off)`
    * and therefore touches context windows `first_win .. last_win`
    * (`off DIV ctxSize`; integral DIV, not `/` — long division through
    * doubles would corrupt offsets past 2^53). Zero-token docs are
    * dropped: they occupy no span and would otherwise alias the window
    * boundary of their neighbor.
    *
    * Output: (`idCol`, shard, `tokensCol`, start_off, first_win,
    * last_win, n_windows) — all integral, exactly reproducible by any
    * engine from the same (id, token-count) pairs.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      ctxSize: Int,
      nShards: Int): DataFrame = {
    require(ctxSize > 0, s"ctxSize must be positive, got $ctxSize")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
    df.filter(col(tokensCol) > 0)
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("end_off", sum(col(tokensCol)).over(w))
      .withColumn("start_off", col("end_off") - col(tokensCol))
      .withColumn("first_win", expr(s"start_off DIV $ctxSize"))
      .withColumn("last_win", expr(s"(end_off - 1) DIV $ctxSize"))
      .withColumn("n_windows", col("last_win") - col("first_win") + lit(1L))
      .select(col(idCol), col("shard"), col(tokensCol), col("start_off"),
        col("first_win"), col("last_win"), col("n_windows"))
  }

  /** The ATTENTION-MASK span table of the chop-continuous layout: one
    * row per (document, context window) it occupies, with the doc's
    * half-open position range INSIDE that window — exactly the
    * document-boundary table a trainer needs to build block-diagonal
    * attention masks over packed sequences (tokens must not attend
    * across document boundaries within a window). Derived by exploding
    * each [[packSequences]] span over `sequence(first_win, last_win)`
    * and clamping to the window — pure integer projection on top of the
    * one packing exchange; the per-(shard, window) ordering window
    * below is bounded by docs-per-window, never data.
    *
    * `contiguous_ok` is structural: chop packing is gap-free, so within
    * every window each span must start where the previous ended (or at
    * 0) — a false anywhere means the offsets themselves drifted.
    */
  def attentionSpans(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      ctxSize: Int,
      nShards: Int): DataFrame = {
    val spans = packSequences(df, idCol, tokensCol, ctxSize, nShards)
      .withColumn("end_off", col("start_off") + col(tokensCol))
      .withColumn("win", explode(expr("sequence(first_win, last_win)")))
      .withColumn("pos_start",
        greatest(col("start_off") - col("win") * ctxSize, lit(0L)))
      .withColumn("pos_end",
        least(col("end_off") - col("win") * ctxSize, lit(ctxSize.toLong)))
    val w = Window.partitionBy(col("shard"), col("win")).orderBy(col("pos_start"))
    spans
      .withColumn("contiguous_ok",
        coalesce(lag(col("pos_end"), 1).over(w), lit(0L)) === col("pos_start"))
      .select(col(idCol), col("shard"), col("win"), col("pos_start"),
        col("pos_end"), (col("pos_end") - col("pos_start")).as("span_len"),
        col("contiguous_ok"))
  }

  /** Greedy no-split packing (next-fit): documents keep their boundaries —
    * a doc goes into the current bin if it fits, else opens the next bin.
    * The other standard packing mode, used when examples must not cross
    * document boundaries (SFT, eval sets). A doc longer than `binSize`
    * gets a bin of its own (it can never fit a shared one).
    *
    * The fold is inherently sequential per shard — each decision depends
    * on the running fill — so no window/cumsum expresses it. Rather than
    * a driver loop or whole-group materialization, the implementation
    * repartitions on the shard key, sorts within partitions on
    * (shard, id), and streams a per-partition fold that resets at shard
    * boundaries: O(1) state per task, every shard packed in parallel,
    * bounded memory at any corpus size. (`mapPartitions` is the right
    * tool here for the same reason it is in the multimodal codec:
    * genuinely imperative per-partition logic that Catalyst expressions
    * cannot express.)
    *
    * Output: (`idCol`, shard, `tokensCol`, bin, bin_fill) — bin is the
    * 0-based bin index within the shard, bin_fill the running token count
    * of that bin after placing the doc. All integral and exactly
    * reproducible from the same (id, token-count) pairs by any engine
    * replaying the fold (the oracle does, via a recursive CTE).
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      binSize: Int,
      nShards: Int): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.filter(col(tokensCol) > 0)
      .select(pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, Long)]
    val packed = prepared.mapPartitions { rows =>
      // streaming fold; state resets when the shard changes (a partition
      // holds whole shards, possibly several — hash partitioning never
      // splits one)
      var curShard = -1L
      var bin = 0L
      var fill = 0L
      rows.map { case (shard, id, tok) =>
        if (shard != curShard) { curShard = shard; bin = 0L; fill = tok }
        else if (fill + tok <= binSize) { fill += tok }
        else { bin += 1L; fill = tok }
        (id, shard, tok, bin, fill)
      }
    }
    packed.toDF("id", "shard", "tok", "bin", "bin_fill")
      .select(col("id").as(idCol), col("shard"), col("tok").as(tokensCol),
        col("bin"), col("bin_fill"))
  }

  /** Length-sorted inference batching: within each shard, order documents
    * longest-first and cut consecutive runs of `batchSize` into batches,
    * so each padded batch holds near-equal lengths — the standard trick
    * that turns O(max_len) padding waste per batch into near-zero for
    * everything but the length distribution's knees. Emits per-batch
    * accounting: `padded = n_docs · max_tok` (every sequence padded to
    * the batch max — the tensor the server actually allocates) vs
    * `sum_tok` of real tokens; `waste = padded − sum_tok` is the metric
    * a batching policy is judged by, and comparing `Σ waste` against an
    * arrival-order baseline is how this operator earns its place in a
    * serving/eval pipeline.
    *
    * Order is (tok desc, id asc) — a total order, so batch membership is
    * deterministic on any engine. One shuffle (the per-shard window);
    * the groupBy re-uses the same shard-hashed distribution. Zero-token
    * docs are dropped as in the packers.
    */
  def lengthBatch(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      batchSize: Int,
      nShards: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(tokensCol).desc, col(idCol).asc)
    df.filter(col(tokensCol) > 0)
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"(__rn - 1) DIV $batchSize"))
      .groupBy(col("shard"), col("batch"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        max(col(tokensCol)).cast("long").as("max_tok"),
        sum(col(tokensCol)).cast("long").as("sum_tok"))
      .withColumn("padded", col("n_docs") * col("max_tok"))
      .withColumn("waste", col("padded") - col("sum_tok"))
  }

  /** T5-style span-corruption schedule (Raffel et al. 2020 §3.1.4 mask
    * ~15% of tokens in short spans), made DETERMINISTIC and replayable:
    * spans of `spanLen` tokens start at positions ≡ `pmod(doc_id,
    * stride)` (mod `stride`), so every engine derives the identical
    * mask without a random stream, corruption rate = spanLen/stride
    * exactly in the long-doc limit, and spans can never overlap by
    * construction (stride > spanLen is enforced, the structural
    * guarantee sampled-span schedulers have to dedup/clip for).
    * Per-doc phase from the id decorrelates span positions across
    * documents — position i is masked in 1/stride of docs, not all.
    *
    * One narrow projection + one explode, zero shuffle: the span table
    * is (doc_id, span_start, span_end, n_tokens, in_bounds) with
    * in_bounds a per-row certificate (span_end < n_tokens — false
    * anywhere means the sequence arithmetic drifted).
    */
  def spanCorruption(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      spanLen: Int = 3,
      stride: Int = 20): DataFrame = {
    require(stride > spanLen && spanLen >= 1,
      s"need stride > spanLen >= 1, got stride=$stride spanLen=$spanLen")
    val n = col(tokensCol).cast("long")
    val phase = pmod(col(idCol), lit(stride.toLong))
    df.select(col(idCol), n.as("n_tokens"), phase.as("__r"))
      // guard: Spark sequence(start, stop) with start > stop counts DOWN
      .withColumn("__starts",
        when(col("n_tokens") - spanLen >= col("__r"),
          expr(s"sequence(__r, n_tokens - $spanLen, ${stride}L)"))
          .otherwise(array().cast("array<long>")))
      .select(col(idCol), col("n_tokens"), explode(col("__starts")).as("span_start"))
      .withColumn("span_end", col("span_start") + (spanLen - 1))
      .withColumn("in_bounds", col("span_end") < col("n_tokens"))
  }
}
