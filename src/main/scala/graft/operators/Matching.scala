package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sided matching. */
object Matching {

  /** Gale–Shapley deferred acceptance (1962) — the unique
    * PROPOSER-OPTIMAL stable matching over bounded preference lists.
    * Parallel rounds: EVERY free proposer with preferences left
    * proposes simultaneously to its next choice; each acceptee keeps
    * the best of {current tenant} ∪ {this round's proposers} by
    * min (aCol, proposer id) — a total order, so every round is
    * deterministic. McVitie & Wilson (1971): the final matching is
    * INDEPENDENT of proposal order — which is both why the parallel
    * rounds are legitimate and why a sequential one-proposal-at-a-time
    * replay (the DuckDB oracle) certifies the distributed run
    * bit-for-bit. Stability is by construction: a blocking pair would
    * need an acceptee that rejected a proposer it prefers to its
    * final tenant, and tenants only ever IMPROVE.
    *
    * `prefs`: one row per (proposer `sCol`, rank `rankCol` dense
    * 1..k_s, acceptee `pCol`, acceptor score `aCol`) — the acceptor
    * prefers min (score, proposer id). Ids and scores are LONGs.
    *
    * Scale shape: state is one row per proposer (s, ptr,
    * matched-part, its score); each round is one rank-equi-join
    * against the pinned pref frame + one per-acceptee min aggregate —
    * all hash-partitioned on data-sized keys, 2 driver actions per
    * round. Round count: every free proposer advances its pointer
    * every round, so Σ pointer-advances ≤ Σk_s bounds total work;
    * displacement cascades can serialize, so `maxRounds` guards
    * loudly (an unfinished run would silently read as unmatched).
    */
  def galeShapley(
      prefs: DataFrame,
      sCol: String,
      rankCol: String,
      pCol: String,
      aCol: String,
      maxRounds: Int = 64): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val pr = Checkpoints.pin(prefs.select(
      col(sCol).cast("long").as("ps"), col(rankCol).cast("long").as("pr"),
      col(pCol).cast("long").as("pp"), col(aCol).cast("long").as("pa")))
    var sup = Checkpoints.pin(pr.select(col("ps").as("s")).distinct()
      .withColumn("ptr", lit(1L))
      .withColumn("part", lit(null).cast("long"))
      .withColumn("pacost", lit(null).cast("long")))
    var live = 1L
    var round = 0
    // superseded pins release ONE ROUND LATE: the state is lazily
    // pinned, and only the NEXT round's count materializes it — an
    // immediate release would unpersist the truncated chain it still
    // reads (local checkpoints cannot recompute)
    var toRelease: Seq[DataFrame] = Nil
    while (live > 0 && round < maxRounds) {
      // a free proposer with no pref at its pointer is exhausted — the
      // rank equi-join drops it, so it never blocks termination
      val props = sup.filter(col("part").isNull)
        .join(pr, col("s") === col("ps") && col("ptr") === col("pr"))
        .select(col("s"), col("pp").as("p"), col("pa").as("a"))
        .transform(Checkpoints.pin(_, eager = false))
      live = props.count() // materializes props AND the current state
      Checkpoints.release(toRelease)
      toRelease = Nil
      if (live > 0) {
        val tenants = sup.filter(col("part").isNotNull)
          .select(col("s"), col("part").as("p"), col("pacost").as("a"))
        // each proposer is free XOR a tenant, so it candidates for
        // exactly one acceptee and the per-s winner row is unique
        val winners = props.unionByName(tenants)
          .groupBy(col("p"))
          .agg(min(struct(col("a"), col("s"))).as("w"))
          .select(col("w.s").as("s"), col("p").as("wpart"),
            col("w.a").as("wa"))
        val pinned = Checkpoints.pin(sup
          .join(props.select(col("s"), lit(1L).as("__prop")), Seq("s"), "left")
          .join(winners, Seq("s"), "left")
          .select(col("s"),
            (col("ptr") + coalesce(col("__prop"), lit(0L))).as("ptr"),
            col("wpart").as("part"), col("wa").as("pacost")),
          eager = false)
        toRelease = Seq(sup, props)
        sup = pinned
      } else Checkpoints.release(Seq(props))
      round += 1
    }
    // the final state may still be unmaterialized; the output pin below
    // materializes it before anything else releases
    if (live > 0)
      throw new IllegalStateException(
        s"galeShapley did not quiesce within $maxRounds rounds ($live " +
          "proposals still firing) — raise maxRounds; stopping early " +
          "would silently emit an unstable partial matching")
    val out = Checkpoints.pin(sup.filter(col("part").isNotNull)
      .join(pr, col("s") === col("ps") && col("part") === col("pp"))
      .select(col("s"), col("part").as("p"), col("pr").as("pref_rank"),
        col("pacost").as("acceptor_cost")))
    Checkpoints.release(Seq(pr, sup))
    out
  }
}
