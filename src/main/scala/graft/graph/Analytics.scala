package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Whole-graph analytics over DataFrame edge sets — the algorithms a
  * graph store runs OUTSIDE pattern matching (connected components
  * lives with dedup, `Dedup.components`). Everything is join+agg
  * iteration: one shuffle per round keyed on the node id, edge set
  * persisted once — the Pregel-without-Pregel shape that scales with
  * executors.
  */
object GraphAnalytics {

  /** Fixed-iteration PageRank over a directed (src, dst) edge set.
    *
    * Per round: contribution = rank/out-degree summed over in-edges
    * (one shuffle on dst), then `rank = (1-d)/N + d·contrib`. Nodes
    * without out-edges leak their mass (no dangling redistribution) —
    * the deliberate, documented variant: it keeps every round a
    * single local-sum pass with no extra global aggregate, and
    * ranking ORDER is what downstream consumers use. Fixed `iters`
    * rather than convergence-probing: deterministic cost, and the
    * g10 oracle unrolls the same rounds as SQL CTEs.
    *
    * Scale: the per-edge (src, deg) frame is computed once and
    * persisted; each round shuffles the skinny (id, rank) frame on
    * the same key, so AQE reuses the partitioning. At 100 TB,
    * pre-bucket edges by src and the rank join co-locates.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    // e feeds four consumers (both node projections, the degree agg,
    // the per-edge join) — persist it or each one re-derives the scan
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N rides a broadcast 1-row frame — no driver-side count action
    val nStats = nodes.agg(count(lit(1)).as("n"))
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.crossJoin(broadcast(nStats))
      .select(col("id"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .groupBy(withDeg("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      ranks = nodes.join(contrib, Seq("id"), "left_outer")
        .crossJoin(broadcast(nStats))
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
      // truncate lineage every few rounds — the iterative-algorithm
      // discipline (same cadence rationale as PropertyGraph.bfs):
      // without it plan depth grows with iters and Catalyst analysis
      // cost compounds; at the default iters=3 this never fires
      if (i % 5 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    val res = ranks.localCheckpoint(true)
    e.unpersist(false)
    nodes.unpersist(false)
    withDeg.unpersist(false)
    res
  }
}
