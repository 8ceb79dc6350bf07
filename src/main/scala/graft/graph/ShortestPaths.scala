package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop single/multi-source shortest paths (Bellman-Ford with
  * a fixed round budget) — the isochrone / network-reach primitive
  * over the footprint proximity graph (same edge fixture as
  * [[PageRank]] and the triangle census).
  *
  * Semantics after R rounds: dist(v) = the exact minimum path weight
  * from any source to v over paths of AT MOST R edges (a bounded-hop
  * isochrone — the natural contract for a fixed-round distributed
  * relax, and exactly replayable by a bounded recursive CTE).
  * Unreached vertices carry no row.
  *
  * Scale posture: per round ONE edge⋈dist equi-join plus one
  * map-side-combined MIN aggregate on the destination key — the CC /
  * PageRank shape. No global structure, no windows; the frontier
  * never re-materializes the full graph. The edge table is
  * checkpointed ONCE up front (every round joins it — left
  * un-materialized, the whole edge derivation, e.g. the banded
  * proximity self-join, re-executes `rounds` times: guide §5
  * "recomputing is more expensive than the memory"; measured 6×
  * recompute on q_sssp), while the per-round dist checkpoints are
  * LAZY: dist is tiny, so plan truncation is all that is needed and
  * the whole relax runs as one pipelined job instead of one
  * materialization job per round. */
object ShortestPaths {

  /** edges(src, dst, w) must already be DIRECTED (emit both
    * directions for an undirected graph); sources(v). */
  def boundedSssp(edges: DataFrame, sources: DataFrame,
                  rounds: Int): DataFrame = {
    val e = edges.localCheckpoint()
    var dist = sources.select(col("v"), lit(0L).as("dist"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      // dist is vertex-sized vs the edge table: broadcast it so the
      // relax never shuffles edges (guide §3.1; drop the hint when
      // |V| exceeds the broadcast budget)
      dist = broadcast(dist).join(e, col("v") === col("src"))
        .select(col("dst").as("v"), (col("dist") + col("w")).as("nd"))
        .unionAll(dist.select(col("v"), col("dist").as("nd")))
        .groupBy("v").agg(min("nd").as("dist"))
        .localCheckpoint(false)
    }
    dist
  }
}
