package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering backbone of near-dup
  * deduplication: LSH emits PAIRS, but the unit of removal is the
  * connected COMPONENT (a doc may pair with several others; keeping one
  * representative per component needs the transitive closure).
  *
  * [[minLabel]] runs min-label propagation with pointer jumping: each
  * round (1) every vertex takes the min label over its neighbors (edge
  * join + map-side-combined min agg) and (2) labels compress through
  * themselves (label(v) := label(label(v)), a self-join) — the classic
  * two-step that converges in O(log diameter) rounds rather than
  * O(diameter) for plain propagation. Per round the shuffles carry only
  * (id, label) pairs and the edge list; the driver sees one scalar
  * (the changed-count) per round.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (id, component) for every vertex in `pairs` (columns idA, idB),
    * where `component` is the minimum vertex id reachable from `id`.
    */
  /** Triangle count over an undirected edge list given as (id_a < id_b)
    * pairs: the canonical two-join counting shape — for every wedge
    * a<b<c with edges (a,b) and (b,c), probe for the closing edge (a,c).
    * Each join is hash-partitioned on its key; at web scale, order
    * vertices by degree first (the node-iterator optimization) so hubs
    * don't dominate the wedge join — noted, not needed at oracle scale.
    */
  def triangleCount(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val e = pairs.select(col(idA).as("a"), col(idB).as("b"))
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), "b")
    wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  def minLabel(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIters: Int = 25): DataFrame = {
    // localCheckpoint (not cache): iterative DataFrame loops grow their
    // LOGICAL plan every round even when data is cached — analysis and
    // optimization cost compounds until the driver burns heap on a plan
    // tree thousands of nodes deep. Checkpointing truncates the lineage
    // each round, so every iteration plans against a flat scan. The
    // INPUT checkpoints first: the symmetrizing union would otherwise
    // evaluate the caller's pair pipeline (e.g. the full LSH+verify
    // dedup path) once per branch.
    // Checkpoints.pin (NOT bare localCheckpoint): the checkpoint carries
    // the origin plan's size estimate, and a loop that re-pins a frame
    // derived from the previous pin SQUARES that estimate per round —
    // see the pin scaladoc for the measured planning freeze. Every
    // checkpoint in this loop goes through the clamp.
    val p = Checkpoints.pin(pairs.select(col(idA).as("src"), col(idB).as("dst")))
    val edges = Checkpoints.pin(
      p.union(p.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    // RDD-level release: Dataset.unpersist goes through the CacheManager
    // and leaves checkpoint storage pinned (see Checkpoints)
    Checkpoints.release(Seq(p))
    var labels = Checkpoints.pin(
      edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    var prevRound = labels // previous round's checkpointed data
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // (1) neighbor min: the smallest label in each vertex's neighborhood
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val afterProp = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // (2) pointer jumping: compress label chains through themselves.
      // The previous label rides along as `old` so convergence is read
      // off the checkpointed rows with a plain scan, not another join.
      val byId = afterProp.select(col("id").as("label"), col("label").as("plabel"))
      // LAZY checkpoint: the convergence count right below is the
      // round's one action and materializes it — an eager checkpoint
      // here would run a second, redundant job per round (the exact
      // fixed overhead that made PageRank's toy-graph rounds cost
      // seconds each)
      val next = Checkpoints.pin(
        afterProp.join(byId, Seq("label"), "left")
          .select(col("id"), col("old"),
            least(col("label"), coalesce(col("plabel"), col("label"))).as("label")),
        eager = false)
      changed = next.filter(col("label") < col("old")).count()
      // only the current round's checkpoint stays persisted — without the
      // explicit release every historical label table accumulates in
      // executor storage for the whole run (the count() above is the
      // action that materialized `next`, so the superseded round is
      // provably no longer needed)
      Checkpoints.release(Seq(prevRound))
      prevRound = next
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    Checkpoints.release(Seq(edges))
    log.info(s"minLabel ran $iter rounds (the last confirming quiescence)")
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIters rounds " +
          s"($changed labels still changing) — raise maxIters; returning " +
          "partial labels would silently keep duplicate representatives")
    labels
  }

  /** Dedup by component: keep only the min-id representative of every
    * connected component of `pairs`; rows not in any pair survive.
    */
  def dedupByComponent(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val drops = minLabel(pairs, idA, idB)
      .filter(col("label") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }
}
