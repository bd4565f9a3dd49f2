package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation-harness operators: the aggregate metrics an LLM eval
  * pipeline computes over (problem, sample, verdict) tables at corpus
  * scale. All-integer renderings throughout — the repo's cross-engine
  * discipline.
  */
object EvalOps {

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating LLMs Trained on
    * Code"): for a problem with `n` samples of which `c` pass,
    * pass@k = 1 − C(n−c, k)/C(n, k), computed EXACTLY as the telescoped
    * integer product Π_{j=0..k−1}(n−c−j) over Π_{j=0..k−1}(n−j) — no
    * floats, no factorials (the paper's own numerical recipe, made
    * integer-exact). Products are accumulated in DECIMAL(38,0): the
    * numerator is bounded by n^k·1000, so exactness holds whenever
    * n ≤ 10^(35/k) (e.g. n ≤ 3162 at k = 10, n ≤ 4·10^6 at k = 5 — any
    * real eval harness); a group exceeding that bound raises a LOUD
    * runtime error instead of overflowing silently. Emitted per-mille
    * with the floor division both engines share; when n−c < k the
    * failure term is zero and pass@k = 1000 exactly.
    *
    * One groupBy per problem — the only shuffle; the estimator itself
    * is a pure projection over (n, c).
    */
  def passAtK(
      samples: DataFrame,
      problemCol: String,
      passCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k out of sane range: $k")
    // Largest n for which n^k * 1000 provably fits DECIMAL(38,0).
    val maxN = math.pow(10.0, 35.0 / k).toLong
    def fallingProduct(base: Column): Column =
      (0 until k).map(j => (base - j).cast("decimal(38,0)")).reduce(_ * _)
    samples
      .groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol), 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= k) // estimator undefined below k samples
      .withColumn("__num", fallingProduct(col("n") - col("c")) * lit(1000L).cast("decimal(38,0)"))
      .withColumn("__den", fallingProduct(col("n")))
      .withColumn(s"pass_at_${k}_pm",
        when(col("n") > maxN, raise_error(concat(
          lit(s"passAtK: n exceeds exact-decimal bound $maxN for k=$k (n="),
          col("n").cast("string"), lit(")"))).cast("long"))
          .when(col("n") - col("c") < k, 1000L)
          .otherwise(lit(1000L) - expr("__num div __den")))
      .withColumn("pass_at_1_pm", expr("(c * 1000) div n"))
      .drop("__num", "__den")
  }

  /** Conversation assembly for SFT data: each key's last `maxTurns`
    * events, in time order, rendered to one prompt string — the
    * chat-template step between an event log and a training example.
    * The whole per-key fold is ONE collect_list + sort_array + slice +
    * array_join chain (bounded by the key's event count, then by
    * `maxTurns`), so assembly is a keyed aggregate with no window and
    * no driver-side loop; determinism comes from the (ts, id) sort key
    * being unique per event.
    */
  def assembleConversations(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      roleCol: String,
      contentCol: String,
      maxTurns: Int): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be positive, got $maxTurns")
    events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_turns_total"),
        sort_array(collect_list(struct(
          col(tsCol).as("ts"), col(idCol).as("id"),
          col(roleCol).as("role"), col(contentCol).as("content")))).as("__turns"))
      .withColumn("__kept", expr(s"slice(__turns, -least(size(__turns), $maxTurns), " +
        s"least(size(__turns), $maxTurns))"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("convo",
        array_join(expr("transform(__kept, t -> concat(t.role, '=', t.content))"), " | "))
      .select(col(keyCol), col("n_turns_total"), col("n_kept"), col("convo"))
  }
}
