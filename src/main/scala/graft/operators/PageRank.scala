package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PageRank in pure integer arithmetic (Page et al. 1999, with scores as
  * fixed-point integers): score(v) ← (S·15) div 100 + (85·Σ_{u→v}
  * (score(u) div deg(u))) div 100, where S is the fixed-point scale.
  * Every operation is an integer floor-division or sum — no float
  * anywhere — so any engine replays the iteration bit-identically and a
  * fixed iteration count is a well-defined, oracle-checkable result
  * (float PageRank differs in the last ulps across engines and
  * summation orders; integer PageRank cannot).
  *
  * 100 TB shape: the edge list (pre-joined with out-degrees, checkpointed
  * once) is the only corpus-sized state; each iteration is ONE shuffle —
  * messages grouped by destination, map-side-combined — plus a broadcast-
  * able node-spine join, and each round's scores are localCheckpoint-
  * pinned so the logical plan stays flat (the [[Components.minLabel]]
  * lineage discipline).
  *
  * PRECONDITION (the NaN-precondition discipline of [[Stats]]): message
  * sums accumulate in DECIMAL(38,0) — safe to ~1e36 — but the damped
  * jump `(in_sum·85) div 100` lands back in a 64-bit score, so
  * max-in-degree·S must stay below ~1.08e19 (at the default S=1e12,
  * hubs up to ~10.8M in-edges). Beyond that the jump goes NULL rather
  * than wrapping, and the NULL propagates into a NULL score — loud
  * corruption, never a silently-wrong rank; shrink S for hubbier graphs.
  */
object PageRank {

  /** Ranks after exactly `iters` rounds over the directed edge list
    * (`srcCol`, `dstCol`). Nodes = every endpoint; a node with no
    * out-edges contributes nothing (its mass evaporates — the standard
    * non-normalizing treatment); a node with no in-edges settles at the
    * teleport floor (S·15) div 100.
    */
  def integerPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ewd = e.join(deg, Seq("src")).localCheckpoint(true)
    e.unpersist()
    val nodes = ewd.select(col("src").as("id"))
      .union(ewd.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val teleport = (scale * 15L) / 100L
    var scores = nodes.select(col("id"), lit(scale).as("score"))
    for (_ <- 1 to iters) {
      val inSum = ewd.join(scores, col("src") === col("id"))
        .select(col("dst").as("id"), expr("score div deg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c").cast(DecimalType(38, 0))).as("in_sum"))
      val prev = scores
      // the no-in-edges NULL is resolved BEFORE the division, so an
      // overflow NULL from the jump itself still propagates (a hub past
      // the precondition scores NULL, never the teleport floor)
      scores = nodes.join(inSum, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(teleport) +
            when(col("in_sum").isNull, lit(0L))
              .otherwise(expr("(in_sum * 85) div 100"))).as("score"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    scores
  }
}
