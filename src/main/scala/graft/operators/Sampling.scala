package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Both
  * operators are pure plan transforms — re-running them on the same input
  * yields the same rows regardless of partitioning, task order, or
  * cluster size, which is what makes 100 TB dataset builds reproducible
  * (Spark's `sample()` is seed-stable only per partitioning).
  */
object Sampling {

  /** Stratified head-sample: up to `n` rows per stratum, chosen by
    * ascending `orderCol` (ties impossible when it's a key). The rn <= n
    * filter plans as WindowGroupLimit, so every task keeps at most `n`
    * rows per stratum BEFORE the stratum shuffle — the shuffle carries
    * O(strata × n) rows per task, never the corpus.
    */
  def stratifiedHead(df: DataFrame, strata: Seq[String], orderCol: String, n: Int): DataFrame = {
    require(n > 0)
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Leakage-free split assignment: `xxhash64(key, seed)` buckets each row
    * into the named splits by weight. The SAME key always lands in the
    * SAME split — across runs, partitionings, and joins against other
    * tables keyed the same way (the property random assignment lacks).
    * Zero shuffle: one codegen'd projection.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    val buckets = 1L << 20
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    df.withColumn(splitCol, assignByCuts(bucket, buckets, splits))
  }

  /** Shared cut-threshold assignment: weight prefix sums scaled onto the
    * uniform's `[0, range)` as long cuts, folded into a when-chain. One
    * implementation for both split flavors so a boundary fix can never
    * diverge them.
    */
  private def assignByCuts(
      uniform: Column,
      range: Long,
      splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(c => (c / total * range).toLong)
    splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), elseCol) => when(uniform < cut, lit(name)).otherwise(elseCol)
    }
  }

  /** [[hashSplit]] on the PORTABLE md5 uniform: identical split
    * semantics (same key → same split, zero shuffle, one codegen'd
    * projection) but every assignment is replayable bit-identically in
    * any engine with md5 — so the whole split is oracle-checkable, not
    * just determinism-property-tested. Cuts are integer thresholds on
    * the full `[0, 2^32)` hash range; each cut constant is
    * `(cumWeight / total * 2^32).toLong`, a Scala-side constant an
    * external replay mirrors verbatim.
    */
  def portableSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val range = 4294967296L // 2^32: portableUniform's exclusive upper bound
    df.withColumn(splitCol,
      assignByCuts(portableUniform(col(keyCol)), range, splits))
  }

  /** Deterministic uniform sample of exactly `k` rows: the k smallest
    * [[portableUniform]] values over `keyCol` (key tiebreak — exact-k
    * even under hash collisions). The distributed, REPLAYABLE
    * equivalent of reservoir sampling (Vitter 1985 draws a random
    * k-subset once; bottom-k on a uniform hash draws the SAME k-subset
    * on every engine, run, and partitioning — Cohen & Kaplan 2007's
    * bottom-k sketch as a sampler, and the property a reproducible
    * pipeline audit needs). Rows must be key-unique upstream.
    *
    * Scale shape: plans as TakeOrderedAndProject — every partition
    * keeps its local k before the single k·partitions-row merge; no
    * full sort, no shuffle of the corpus. The merge is driver-side but
    * bounded by k·partitions (the documented bounded-collect class);
    * for corpus-scale k, swap the limit for a threshold filter
    * `u < k/N·2^32` (one scan, no merge) at the cost of approximate k.
    */
  def bottomK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("__u"),
      "bottomK writes '__u' — the input already carries one")
    df.withColumn("__u", portableUniform(col(keyCol)))
      .orderBy(col("__u"), col(keyCol))
      .limit(k)
      .drop("__u")
  }

  /** Priority sampling (Duffield, Lund & Thorup 2005, "Priority
    * sampling for estimation of arbitrary subset sums"): the
    * weight-sensitive sibling of [[bottomK]] — each row's priority is
    * q = w / u with u its [[portableUniform]] draw (shifted off zero),
    * and the sample is the k LARGEST priorities, so heavy rows surface
    * proportionally to weight while staying a pure deterministic
    * function of the key. The priority is ONE IEEE division of two
    * integers (the single-division determinism discipline), so any
    * engine replays the exact ordering; ties break on the key.
    *
    * Scale shape: zero-shuffle projection + distributed top-k
    * (TakeOrderedAndProject — per-partition heaps, never a full sort),
    * the [[bottomK]] plan. Weights must be > 0 (enforce upstream).
    */
  def priorityK(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("__u") && !df.columns.contains("__p"),
      "priorityK writes '__u'/'__p' — the input already carries one")
    df.withColumn("__u", portableUniform(col(keyCol)) + lit(1L))
      .withColumn("__p",
        col(weightCol).cast("double") / col("__u").cast("double"))
      .orderBy(col("__p").desc, col(keyCol))
      .limit(k)
      .drop("__u", "__p")
  }

  /** Portable hash-uniform in `[0, 2^32)`: the first 8 hex digits of
    * `md5(string(key))` as a long. Unlike xxhash64 (Spark-only), md5 is
    * available bit-identically in every engine, so a sampling decision
    * derived from it can be replayed — and therefore oracled — outside
    * Spark. Zero shuffle: one codegen'd projection.
    */
  def portableUniform(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")

  /** Poisson(1) bootstrap weight from the portable uniform — the online
    * bootstrap's per-(row, replicate) multiplicity (Oza & Russell 2001;
    * the Poisson approximation to multinomial resampling every
    * streaming/distributed bootstrap uses, since it needs no global n).
    * The draw is the inverse-CDF walk over FIXED integer thresholds
    * (⌊CDF·2^32⌋ literals below — never a runtime exp), truncated at
    * w = 8 (P ≈ 1e-5 of the tail redistributed to 8; both engines use
    * the same literals so the truncation is exact, not approximate).
    * Same key + replicate ⇒ same weight on any engine, any partitioning
    * — the resample is auditable. Zero-shuffle projection.
    */
  def poissonWeight(keyCol: Column): Column = {
    // cumulative Poisson(1) CDF × 2^32, k = 0..7
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val u = portableUniform(keyCol)
    size(filter(array(thresholds.map(lit(_)): _*), c => u >= c)).cast("long")
  }

  /** Portable k-fold assignment for cross-validation: fold(key) ∈ [0, k)
    * from the md5 uniform — same key, same fold, on any engine and any
    * partitioning (the [[portableUniform]] guarantees), so folds never
    * leak when a pipeline re-shards. Zero-shuffle projection.
    */
  def kFold(keyCol: Column, k: Int): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    pmod(portableUniform(keyCol), lit(k.toLong))
  }

  /** Domain-mixture resampling decision: true iff the row's hash-uniform
    * falls under its domain's target rate `rateNum/rateDen`. Compared in
    * pure integer math (`u * den < num * 2^32` — u < 2^32 and den is
    * small, so no overflow and no float threshold to disagree across
    * engines). Same key ⇒ same decision, independent of partitioning —
    * and the kept set grows monotonically with the rate, so raising a
    * domain's weight only ADDS documents (stable curriculum re-mixes).
    */
  def mixDecision(keyCol: Column, rateNum: Column, rateDen: Int): Column = {
    require(rateDen > 0 && rateDen <= (1 << 20), s"rateDen out of range: $rateDen")
    // clamp the numerator to the denominator: rates >= 1 keep everything,
    // and an unclamped huge numerator (a bad joined config value) would
    // overflow `num * 2^32` to negative and silently DROP the domain —
    // the exact inverse of the intended semantics. Negative numerators
    // keep nothing, which is the right reading of a negative rate. A
    // NULL numerator keeps everything (`least` skips nulls — identically
    // in Spark and DuckDB, so the oracle mirror stays exact).
    portableUniform(keyCol) * lit(rateDen.toLong) <
      least(rateNum.cast("long"), lit(rateDen.toLong)) * lit(4294967296L)
  }

  /** The resampled corpus: rows whose [[mixDecision]] is true. `rateNum`
    * is a per-row column so each domain carries its own target weight
    * (e.g. joined from a mixture config, or derived from the domain
    * name); `rateDen` is the common denominator.
    */
  def mixDomains(df: DataFrame, keyCol: String, rateNum: Column, rateDen: Int): DataFrame =
    df.filter(mixDecision(col(keyCol), rateNum, rateDen))

  /** Sample each domain down to a TOKEN budget (not a row count): rows are
    * ordered by their [[portableUniform]] priority — a deterministic
    * stand-in for a random shuffle — and kept while the domain's running
    * token total stays within `budget`. The row that would cross the
    * budget is dropped, as is everything after it, so `Σ tokens <=
    * budget` holds exactly per domain. This is how a mixture spec given
    * in tokens ("200M tokens of code, 50M of forums") turns into a
    * concrete corpus, and the hash priority makes the draw reproducible
    * and monotone: a bigger budget only ADDS documents.
    *
    * One shuffle (the per-domain window); the cumulative sum is O(1)
    * state per row. Skewed domains behave like any skewed window key —
    * at 100 TB pre-filter obvious bulk (e.g. with [[mixDomains]]) so no
    * single domain's candidate set dwarfs the rest.
    */
  def tokenBudget(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__prio").asc, col(keyCol).asc)
    // non-positive token counts are dropped (as in both packers): zero-token
    // rows are useless in a token-denominated sample, and a NEGATIVE count
    // (a bad upstream join) would make the cumulative sum non-monotone —
    // rows after the budget-crossing row could sneak back in, breaking the
    // bigger-budget-only-adds guarantee
    df.filter(col(tokensCol) > 0)
      .withColumn("__prio", portableUniform(col(keyCol)))
      .withColumn("__cum", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__prio", "__cum")
  }

  /** Exact integer square root `⌊√x⌋` of a non-negative long column,
    * for `0 <= x < 2^62`. `floor(sqrt(double))` alone is exact only
    * while x and the root's square stay inside the double mantissa; the
    * ±1 correction makes the result exact across the whole domain, in
    * Spark and in every engine that replays the same three integer
    * comparisons (sqrt is IEEE correctly-rounded, so the seed differs
    * from the truth by at most 1 either way). The 2^62 bound keeps the
    * `(r+1)²` probe inside long range — row counts cannot approach it.
    */
  def isqrt(x: Column): Column = {
    val r0 = floor(sqrt(x.cast("double"))).cast("long")
    when((r0 + 1) * (r0 + 1) <= x, r0 + 1)
      .when(r0 * r0 > x, r0 - 1)
      .otherwise(r0)
  }

  /** Temperature-scaled domain mixing (the multilingual-pretraining
    * resampler of XLM-R / mT5): sample `totalRows` rows across domains
    * with per-domain share ∝ count^α at α = 1/2, boosting small domains
    * relative to their natural share without letting one giant domain
    * swamp the mix. α = 1/2 is the one exponent whose scaling —
    * [[isqrt]] — is EXACT integer math, which is what makes every
    * allocation and every per-row keep decision replayable in any
    * engine (general α needs pow(), which is not correctly-rounded and
    * can flip allocations across libm builds).
    *
    * Allocation is largest-remainder (Hamilton) apportionment in pure
    * integer arithmetic: base share `totalRows·w_d div W`, the shortfall
    * distributed one row each to the domains with the largest remainders
    * (ties to the lexicographically smaller domain — a total order).
    * Each domain's target is then capped at its population (sampling is
    * WITHOUT replacement, so an over-allocated small domain contributes
    * what it has; the result can undershoot `totalRows` only in that
    * case). Rows are drawn per domain by ascending [[portableUniform]]
    * priority — deterministic, and within a domain the draw is a
    * priority PREFIX, so whenever a domain's target grows it only adds
    * rows. Hamilton apportionment itself is NOT house-monotone (the
    * Alabama paradox: raising `totalRows` can shrink one domain's target
    * by a row while others gain) — callers needing a globally
    * append-only corpus across re-draws should grow per-domain targets
    * explicitly rather than re-apportioning.
    *
    * Scale shape: the domain table (counts → weights → targets) is
    * vocabulary-sized, its windows run on #domains rows, and it joins
    * back broadcast; the corpus pays one count aggregate and one
    * per-domain window — the [[tokenBudget]] skew note applies to the
    * window key.
    */
  def temperatureMix(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      totalRows: Long): DataFrame = {
    require(totalRows > 0, s"totalRows must be positive, got $totalRows")
    // null domains are excluded UP FRONT: they could never join back to
    // the weight table anyway, and leaving them in the counts would hand
    // a weight share to rows that can never be drawn — a silent
    // undershoot of totalRows
    val rows = df.filter(col(domainCol).isNotNull)
    val counts = rows.groupBy(col(domainCol)).agg(count(lit(1)).as("cnt"))
    // domain-level table: #domains rows, so the empty-frame windows are
    // single-partition over a handful of rows, not a data-volume term
    val all = Window.partitionBy(lit(1))
    val targets = counts
      .withColumn("w", isqrt(col("cnt")))
      .withColumn("__W", sum(col("w")).over(all))
      .withColumn("__base", expr(s"($totalRows * w) div __W"))
      .withColumn("__rem", expr(s"($totalRows * w) % __W"))
      .withColumn("__short", lit(totalRows) - sum(col("__base")).over(all))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("__rem").desc, col(domainCol).asc)))
      .withColumn("target",
        least(col("__base") +
          when(col("__rk") <= col("__short"), lit(1L)).otherwise(lit(0L)),
          col("cnt")))
      .select(col(domainCol), col("cnt"), col("w"), col("target"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__prio").asc, col(keyCol).asc)
    rows.join(broadcast(targets), Seq(domainCol))
      .withColumn("__prio", portableUniform(col(keyCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("target"))
      .drop("__prio", "__rn")
  }

  /** EXACT-count stratified split: within every stratum, rank rows by
    * the portable md5 uniform (key tiebreak → total order) and cut the
    * ranking at exact integer boundaries `rn <= (n·cumWeight) div den`.
    * Where [[hashSplit]]/[[portableSplit]] give each row an independent
    * coin (proportions only in expectation — a 40-doc stratum can
    * easily go 36/1/3 on an 8/1/1 split), this guarantees the split
    * SIZES per stratum to the integer floor, which is what a
    * train/val/test protocol over many small strata (per-language,
    * per-source) actually requires. Assignment is still deterministic
    * and leakage-free: same key, same stratum population ⇒ same split.
    *
    * Weights are integers summing to `den` implicitly (den = Σ weights);
    * each cut is `(n · cum_k) div den`, so split k gets exactly
    * `cut_k − cut_{k−1}` rows — the floor-cut allocation (the last
    * split absorbs the remainder; use largest-remainder upstream if
    * mid-split exactness matters more than tail-absorption).
    *
    * Scale shape: one per-stratum rank window (keyed parallelism) over
    * the stratum count window riding the same partitioning — no global
    * sort, no driver-side anything.
    */
  def stratifiedSplit(
      df: DataFrame,
      strata: Seq[String],
      keyCol: String,
      weights: Seq[(String, Int)],
      splitCol: String = "split"): DataFrame = {
    require(strata.nonEmpty && weights.nonEmpty && weights.forall(_._2 > 0),
      s"need strata and positive weights, got strata=$strata weights=$weights")
    val den = weights.map(_._2).sum
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(portableUniform(col(keyCol)).asc, col(keyCol).asc)
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative numerators
    val withRank = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(strata.map(col): _*)).cast("long"))
    val assigned = weights.zip(cuts).init.foldRight(
      lit(weights.last._1): org.apache.spark.sql.Column) {
      case (((name, _), cum), elseCol) =>
        when(col("__rn") * den <= col("__n") * cum, lit(name)).otherwise(elseCol)
    }
    // rn·den <= n·cum  ⟺  rn <= (n·cum) div den — all-integer, no cut
    // materialization; the when-chain takes the FIRST matching boundary
    withRank.withColumn(splitCol, assigned).drop("__rn", "__n")
  }
}
