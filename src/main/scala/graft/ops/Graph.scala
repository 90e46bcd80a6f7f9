package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.GraftReleaseBridge

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

  /** k-core decomposition by simultaneous peeling: repeatedly delete
    * ALL nodes of degree < k (and their incident edges) until none
    * remain; the survivors are the k-core. Returns `(node, deg)` —
    * each surviving node with its degree inside the core.
    *
    * Input: undirected unique edges `(a: long, b: long)` with a < b.
    *
    * Scale shape: each round is one degree aggregation + two left-anti
    * joins against the (small, shrinking) drop set, localCheckpointed
    * so lineage stays flat; superseded blocks release as soon as the
    * next round materializes. Rounds are data-bounded (the degeneracy
    * ordering), not diameter-bounded — simultaneous deletion converges
    * in O(peel-depth) rounds, ≤ ~10 on the co-purchase graphs here.
    * The convergence probe is a count on the drop set — O(1) rows of
    * driver data per round, the same bounded-state exception as CC.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 32): DataFrame = {
    var e = edges.select(F.col("a").cast("long").as("a"),
      F.col("b").cast("long").as("b")).localCheckpoint()
    var round = 0
    var done = false
    var lastDeg: DataFrame = null
    while (!done && round < maxRounds) {
      val deg = e.select(F.col("a").as("n"))
        .unionAll(e.select(F.col("b").as("n")))
        .groupBy("n").agg(F.count(F.lit(1)).as("deg"))
      lastDeg = deg
      val drop = deg.filter(F.col("deg") < k).select("n")
        .localCheckpoint()
      if (drop.count() == 0) done = true
      else {
        val prev = e
        e = e.join(drop.toDF("a"), Seq("a"), "left_anti")
          .join(drop.toDF("b"), Seq("b"), "left_anti")
          .select("a", "b")
          .localCheckpoint()
        GraftReleaseBridge.release(prev)
        round += 1
      }
    }
    // on a maxRounds exit lastDeg is stale (it predates the final edge
    // filter) — recompute so the contract (degrees inside the returned
    // subgraph) holds on every exit path
    val deg = if (done && lastDeg != null) lastDeg
      else e.select(F.col("a").as("n"))
        .unionAll(e.select(F.col("b").as("n")))
        .groupBy("n").agg(F.count(F.lit(1)).as("deg"))
    deg.filter(F.col("deg") >= k)
      .select(F.col("n").as("node"), F.col("deg"))
  }

  /** Personalized PageRank with a fixed iteration count: the restart
    * mass teleports to the SEED set (uniform over seeds present in the
    * graph) instead of all nodes — "importance relative to these
    * seeds", the recommendation/influence primitive. Same shape,
    * lineage discipline, and dangling-mass simplification as
    * [[pageRank]]; per iteration one keyed join + one partial-agg'd
    * groupBy, rank state re-checkpointed and released.
    *
    * Input: directed `(src, dst)` edges, `(node)` seeds.
    * Output: `(node, ppr)` for every node incident to an edge.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(F.col("src").cast("long").as("src"),
      F.col("dst").cast("long").as("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(F.count(F.lit(1)).as("deg"))
    val wedges = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(F.col("src").as("node"))
      .unionAll(e.select(F.col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val seedsIn = seeds.select(F.col("node").cast("long").as("node"))
      .distinct()
      .join(nodes, Seq("node"), "left_semi")
      .localCheckpoint()
    val s = seedsIn.count().toDouble // bounded driver scalar, as pageRank's n
    val base = nodes
      .join(seedsIn.withColumn("__s", F.lit(1)), Seq("node"), "left_outer")
      .select(F.col("node"),
        F.when(F.col("__s").isNotNull, F.lit(1.0) / F.lit(s))
          .otherwise(F.lit(0.0)).as("base"))
      .localCheckpoint()
    var pr = base.select(F.col("node"), F.col("base").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = wedges
        .join(pr, F.col("src") === F.col("node"))
        .select(F.col("dst"), (F.col("pr") / F.col("deg")).as("w"))
        .groupBy("dst").agg(F.sum("w").as("inflow"))
      val prev = pr
      pr = base
        .join(contrib, F.col("node") === F.col("dst"), "left_outer")
        .select(F.col("node"),
          ((F.lit(1.0) - damping) * F.col("base")
            + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)))
            .as("pr"))
        .localCheckpoint()
      GraftReleaseBridge.release(prev)
    }
    pr.select(F.col("node"), F.col("pr").as("ppr"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a FIXED
    * round count and deterministic tie-breaking — community detection
    * over an undirected edge list `(a: long, b: long)` with a < b.
    *
    * Every node starts labeled with its own id; each round every node
    * adopts the most frequent label among its neighbors AND itself
    * (the self-vote damps the 2-coloring oscillation synchronous LPA
    * is prone to on near-bipartite graphs), ties broken toward the
    * SMALLEST label. Fixed rounds + deterministic ties make the result
    * replayable in plain SQL (the oracle unrolls the rounds).
    *
    * Scale shape: the directed edge relation (both directions + one
    * self-loop per node) is localCheckpointed ONCE; each round is one
    * keyed join (edges × labels on src) and two partial-agg'd groupBys
    * — (node, label) counts, then per-node argmax via
    * `max(struct(count, -label))`, which stays a hash aggregate (no
    * per-node window/sort). Label state re-checkpoints per round and
    * releases its predecessor, the [[pageRank]]/[[bfsHops]] lineage
    * discipline. Returns `(node, comm)`.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    // pin the (possibly expensive) edge lineage ONCE — nodes and the
    // directed relation both derive from it
    val und = edges.select(F.col("a").cast("long").as("a"),
      F.col("b").cast("long").as("b")).localCheckpoint()
    val nodes = und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .distinct().localCheckpoint()
    val dir = und.select(F.col("a").as("src"), F.col("b").as("dst"))
      .unionAll(und.select(F.col("b").as("src"), F.col("a").as("dst")))
      .unionAll(nodes.select(F.col("node").as("src"),
        F.col("node").as("dst")))
      .localCheckpoint()
    var lab = nodes.select(F.col("node"), F.col("node").as("lab"))
    for (r <- 1 to rounds) {
      val prev = lab
      lab = dir.join(lab, F.col("src") === F.col("node"))
        .groupBy(F.col("dst"), F.col("lab"))
        .agg(F.count(F.lit(1)).as("c"))
        .groupBy("dst")
        .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).as("nl")))
          .as("m"))
        .select(F.col("dst").as("node"), (-F.col("m.nl")).as("lab"))
        .localCheckpoint()
      if (r > 1) GraftReleaseBridge.release(prev)
    }
    GraftReleaseBridge.release(und)
    GraftReleaseBridge.release(dir)
    GraftReleaseBridge.release(nodes)
    lab.select(F.col("node"), F.col("lab").as("comm"))
  }

  /** Multi-source BFS: minimum hop distance from any seed, frontier
    * expansion bounded to `maxHops` rounds. Returns `(node, hop)` for
    * every node reachable within the bound (seeds at hop 0).
    *
    * Input: directed edges `(src: long, dst: long)` (send both
    * directions for undirected), seeds `(node: long)`.
    *
    * Scale shape: the textbook distributed BFS — each round joins the
    * current FRONTIER (not the visited set, not the whole graph)
    * against the edge list, then anti-joins the accumulated visited
    * set so a node's first discovery wins (= min hop, no per-node min
    * aggregation needed). Rounds are hop-bounded, each one keyed
    * shuffle + one anti-join; both relations localCheckpoint per round
    * so lineage stays flat and superseded blocks release. An early-out
    * count on the frontier — O(1) driver rows — stops dead rounds.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int)
      : DataFrame = {
    val e = edges.select(F.col("src").cast("long").as("src"),
      F.col("dst").cast("long").as("dst")).localCheckpoint()
    var frontier = seeds.select(F.col("node").cast("long").as("node"))
      .distinct().localCheckpoint()
    var visited = frontier.select(F.col("node"), F.lit(0L).as("hop"))
      .localCheckpoint()
    var h = 1
    var live = frontier.count() > 0
    while (live && h <= maxHops) {
      val next = e.join(frontier, F.col("src") === F.col("node"))
        .select(F.col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
      live = next.count() > 0
      if (live) {
        val prevV = visited
        GraftReleaseBridge.release(frontier)
        frontier = next
        visited = visited
          .unionAll(next.select(F.col("node"), F.lit(h.toLong).as("hop")))
          .localCheckpoint()
        GraftReleaseBridge.release(prevV)
      } else {
        GraftReleaseBridge.release(next) // dead round: nothing new found
      }
      h += 1
    }
    // release everything except the returned `visited` checkpoint —
    // the caller only needs that one (mirrors Dedup.connectedComponents)
    GraftReleaseBridge.release(e)
    GraftReleaseBridge.release(frontier)
    visited
  }
}
