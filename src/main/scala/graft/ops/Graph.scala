package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Distributed graph algorithms over edge-list DataFrames.
  *
  * Complements [[graft.dedup.Dedup.connectedComponents]] /
  * `connectedComponentsStar` (the dedup-cluster path) with the
  * damped-PageRank iteration — the generic "importance by linkage"
  * score a curation pipeline uses to weight interlinked corpora
  * (hosts↔documents, buyers↔producers).
  */
object Graph {

  /** Damped PageRank with a fixed iteration count.
    *
    * Input: directed edges `(src: long, dst: long)` (send both
    * directions for an undirected graph). Output: `(node, pr)` for
    * every node incident to an edge; Σ pr = 1 when no node is dangling
    * (dangling nodes receive rank but redistribute nothing — the
    * standard simplification).
    *
    * Scale shape: the degree-weighted edge relation and the node set
    * are eagerly localCheckpointed ONCE, so each iteration is exactly
    * one join + one keyed groupBy over O(|E|) rows with O(|V|) rank
    * state. Rank state re-checkpoints per round so the plan never
    * nests (the CC lesson: un-truncated iterative lineage grows a join
    * deeper per round and blows up analysis). The raw `edges` input is
    * evaluated ~4× while building those two relations — hand in a
    * cheap lineage (a checkpointed/persisted upstream), as q150 does
    * with its distinct pair set. On a cluster the checkpointed edges
    * would be a bucketed table on `src`, making the per-iteration join
    * co-located.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(F.col("src").cast("long").as("src"),
      F.col("dst").cast("long").as("dst"))
    val deg = e.groupBy("src").agg(F.count(F.lit(1)).as("deg"))
    val wedges = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(F.col("src").as("node"))
      .unionAll(e.select(F.col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // N is one driver-side scalar off checkpointed nodes — the same
    // bounded-state exception as CC's convergence count.
    val n = nodes.count().toDouble
    var pr = nodes.select(F.col("node"), (F.lit(1.0) / F.lit(n)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = wedges
        .join(pr, F.col("src") === F.col("node"))
        .select(F.col("dst"), (F.col("pr") / F.col("deg")).as("w"))
        .groupBy("dst").agg(F.sum("w").as("inflow"))
      pr = nodes
        .join(contrib, F.col("node") === F.col("dst"), "left_outer")
        .select(F.col("node"),
          ((F.lit(1.0) - damping) / F.lit(n)
            + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)))
            .as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
