package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One merge step of byte-pair-encoding tokenizer training (Sennrich et
  * al. 2016): count adjacent symbol pairs over the weighted word
  * vocabulary, pick the most frequent pair (count desc, then pair
  * lexicographic — a total tie-break), and apply the merge to every word
  * with the canonical greedy LEFT-TO-RIGHT, NON-OVERLAPPING rule.
  *
  * The non-overlap rule is the subtle part: in `aaaa` merging (a,a)
  * yields [aa, aa], not three overlapping merges. Runs of consecutive
  * match positions are found as gaps-and-islands (position minus rank),
  * and within each run every ODD-ranked position is a merge start — the
  * exact greedy semantics, computed as two window functions instead of a
  * sequential scan, so it distributes.
  *
  * Integer-only (weights, counts, positions) and string-exact, so any
  * engine replays the chosen pair AND every merged word bit-identically.
  *
  * 100 TB shape: BPE training never touches the corpus — it runs on the
  * WEIGHTED VOCABULARY (one corpus scan builds it, upstream). Pair
  * counts are a vocabulary-sized map-side-combined aggregate; the best
  * pair is a single-row broadcast; the merge application windows over
  * words (shuffle keyed on the word, vocabulary-sized). Iterating the
  * step re-feeds the emitted representation — each round is the same
  * bounded shape.
  */
object Bpe {

  /** Applies one merge to the initial (per-character) symbolization of
    * each word. Output per word: the weight, the chosen pair (constant
    * columns `b1`,`b2`), the number of merges applied, and the new
    * space-joined symbol representation.
    *
    * A vocabulary with no word of length >= 2 has no pairs, hence no
    * best pair, and returns EMPTY (the oracle mirrors this via its
    * cross join against the empty best set) — a real tokenizer-training
    * run never meets this, but the degenerate semantics are pinned.
    */
  def mergeStep(words: DataFrame, wordCol: String, weightCol: String): DataFrame = {
    // vocabulary-sized and consumed by three subtrees (pair counts, the
    // char rebuild, the final join) — checkpoint so the caller's corpus
    // aggregation runs ONCE, not per consumer (the Cooccur trap)
    val base = words.filter(col(wordCol).isNotNull && length(col(wordCol)) >= 1)
      .select(col(wordCol).as("word"), col(weightCol).cast("long").as("wt"))
      .localCheckpoint(true)
    // adjacent char pairs, 0-based anchor i (the >= 2 guard keeps
    // sequence() ascending — the Cooccur 1-token-doc trap)
    val pairs = base.filter(length(col("word")) >= 2)
      .select(col("word"), col("wt"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> struct(i - 1 AS i, " +
          "substring(word, i, 1) AS p1, substring(word, i + 1, 1) AS p2))")).as("p"))
      .select(col("word"), col("wt"), col("p.i"), col("p.p1"), col("p.p2"))
    val best = pairs.groupBy(col("p1"), col("p2"))
      .agg(sum(col("wt")).as("cnt"))
      .orderBy(col("cnt").desc, col("p1").asc, col("p2").asc)
      .limit(1)
      .select(col("p1").as("b1"), col("p2").as("b2"))
      .localCheckpoint(true) // single row, consumed by matches + rebuild
    // greedy non-overlap: islands of consecutive match positions, odd
    // offsets within each island are the merge starts
    val wRun = Window.partitionBy(col("word")).orderBy(col("i"))
    val starts = pairs.join(broadcast(best),
        col("p1") === col("b1") && col("p2") === col("b2"), "left_semi")
      .withColumn("rn", row_number().over(wRun))
      .withColumn("isl", col("i") - col("rn"))
      .withColumn("off", row_number().over(
        Window.partitionBy(col("word"), col("isl")).orderBy(col("i"))))
      .filter(col("off") % 2 === 1)
      .select(col("word"), col("i").as("mi"))
    val chars = base.select(col("word"), col("wt"), posexplode(expr(
        "transform(sequence(1, length(word)), j -> substring(word, j, 1))")).as(Seq("j", "c")))
    val rebuilt = chars
      .join(starts.select(col("word"), col("mi").as("j"), lit(true).as("is_start")),
        Seq("word", "j"), "left_outer")
      .join(starts.select(col("word"), (col("mi") + 1).as("j"), lit(true).as("is_covered")),
        Seq("word", "j"), "left_outer")
      .filter(col("is_covered").isNull)
      .crossJoin(broadcast(best))
      .select(col("word"), col("j"), col("is_start"),
        when(col("is_start"), concat(col("b1"), col("b2"))).otherwise(col("c")).as("sym"))
      .groupBy(col("word"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(j, sym))), s -> s.sym)"), " ")
          .as("new_repr"),
        // merge starts survive the covered-filter (starts are >= 2 apart,
        // so no start is another start's covered position)
        sum(when(col("is_start"), 1L).otherwise(0L)).as("n_merges_raw"))
    base.join(rebuilt, Seq("word"))
      .crossJoin(broadcast(best))
      .select(col("word").as(wordCol), col("wt").as(weightCol),
        col("b1"), col("b2"), col("n_merges_raw").as("n_merges"), col("new_repr"))
  }

  /** FULL BPE trainer loop (r11 — grows [[mergeStep]] into the actual
    * tokenizer-training artifact a data pipeline ships): iterates the
    * merge step to `numMerges`, returning the ORDERED merge list
    * `(step, b1, b2, cnt)` — the learned merge table — plus the final
    * per-word symbolization.
    *
    * State representation: each word's symbol sequence as a
    * DOUBLE-SPACE-joined string with double-space sentinels
    * (`"␣␣l␣␣o␣␣w␣␣"`). This makes one merge step a single plain
    * `replace(repr, ' b1  b2 ', ' b1b2 ')`: the pattern consumes ONE
    * space from each doubled gap and the replacement restores it, so
    * consecutive non-overlapping occurrences stay matchable ("a a a a"
    * merges to [aa, aa] in one scan) while the invariant (every gap
    * exactly two spaces) makes cross-symbol false matches impossible —
    * symbols are space-free and a pattern's interior spaces only align
    * with real gaps. Left-to-right non-overlapping `replace` is exactly
    * the canonical greedy merge rule (same semantics as mergeStep's
    * odd-position islands, BpeTrainSpec proves step-1 agreement), and
    * both Spark's `replace` and DuckDB's `replace` implement it
    * identically — so the oracle replays every round bit-for-bit with
    * NO regex lookarounds (DuckDB's RE2 has none).
    *
    * Per round: one vocabulary-sized pair aggregation (map-side
    * combined) picks the best pair (count desc, then (b1, b2)
    * lexicographic — a total tie-break); the 1-row collect is the
    * PageRank-style bounded driver fold; the merge applies as a pure
    * column expression over the checkpointed state, and superseded
    * rounds release their checkpoint storage ([[Checkpoints]]). Stops
    * early when no pairs remain (fully merged vocabulary).
    *
    * 100 TB shape: identical to [[mergeStep]] — the corpus is touched
    * once upstream to build the weighted vocabulary; every round is
    * vocabulary-sized, the driver state is O(numMerges) merge rows.
    */
  def train(
      words: DataFrame,
      wordCol: String,
      weightCol: String,
      numMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    // RDD-layer round loop (r17): a DataFrame round pays a full Catalyst
    // pass for the pair-count collect AND one for the state pin, ~2 AQE
    // jobs each, and with 16 rounds the driver dominated the queries
    // (profile: wall 3.0 s vs 0.5 executor task-seconds). The round body
    // is a pure string map + pair count over the pinned vocabulary, so
    // it runs at the RDD layer — plans NOTHING per round (the boruvkaMsf
    // lesson). Exactness is preserved operation for operation:
    //  - trim/split("  ")/replace(literal) match the SQL functions on
    //    the double-space invariant (edges are literal spaces, gaps are
    //    exactly two spaces, symbols are space-free);
    //  - weights sum in Long; the (cnt desc, b1, b2) argmin compares
    //    symbols in UTF8String BINARY order — byte-identical to the
    //    DataFrame sort for any alphabet, not just ASCII;
    //  - the final frame rebuilds on the ORIGINAL schema.
    val stateDf = words
      .filter(col(wordCol).isNotNull && length(col(wordCol)) >= 1)
      .select(col(wordCol).as("word"), col(weightCol).cast("long").as("wt"),
        concat(lit("  "), regexp_replace(col(wordCol), "(.)", "$1  ")).as("repr"))
    val schema = stateDf.schema
    val vocab = stateDf.rdd
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    import org.apache.spark.unsafe.types.UTF8String
    val bestOrd: Ordering[((String, String), Long)] =
      (x: ((String, String), Long), y: ((String, String), Long)) => {
        val c = java.lang.Long.compare(y._2, x._2) // count DESC
        if (c != 0) c
        else {
          val c1 = UTF8String.fromString(x._1._1).compareTo(UTF8String.fromString(y._1._1))
          if (c1 != 0) c1
          else UTF8String.fromString(x._1._2).compareTo(UTF8String.fromString(y._1._2))
        }
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var reprs = vocab.map { case (_, wt, repr) => (wt, repr) }
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = reprs
        .flatMap { case (wt, repr) =>
          val syms = repr.trim.split("  ")
          if (syms.length < 2) Iterator.empty
          else (1 until syms.length).iterator.map(i => ((syms(i - 1), syms(i)), wt))
        }
        .reduceByKey(_ + _)
        .takeOrdered(1)(bestOrd)
      if (best.isEmpty) exhausted = true
      else {
        val ((b1, b2), cnt) = best(0)
        merges += ((step, b1, b2, cnt))
        val (from, to) = (" " + b1 + "  " + b2 + " ", " " + b1 + b2 + " ")
        reprs = reprs.map { case (wt, repr) => (wt, repr.replace(from, to)) }
        step += 1
      }
    }
    // replay the learned merge chain once over the pinned vocabulary to
    // rebuild the final per-word frame on the original schema
    val learned = merges.toList.map { case (_, b1, b2, _) =>
      (" " + b1 + "  " + b2 + " ", " " + b1 + b2 + " ")
    }
    val finalRows = vocab.map { case (word, wt, repr) =>
      org.apache.spark.sql.Row(word, wt,
        learned.foldLeft(repr) { case (r, (from, to)) => r.replace(from, to) })
    }
    val spark = words.sparkSession
    val finalState = spark.createDataFrame(finalRows, schema).localCheckpoint(true)
    vocab.unpersist(blocking = false)
    (merges.toSeq, finalState)
  }
}
