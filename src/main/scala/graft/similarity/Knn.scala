package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.plans.VectorExpressions.cosineF

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force exact top-k is the correctness baseline: broadcast the
  * (small) query set against the corpus — one scan, no shuffle of the
  * corpus, per-partition partial ranking. The IVF variant is the scale
  * path: restrict the scan to the `nprobe` nearest coarse cells.
  */
object Knn {

  /** Cosine similarity as a pure SQL higher-order-function expression.
    * Kept as documentation/reference: HOFs are CodegenFallback (boxed
    * per-element eval), so the hot paths below use the native codegen'd
    * [[graft.plans.VectorExpressions.cosineF]] instead — identical
    * results (same left-to-right double summation), ~10× cheaper.
    */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)),
                  cast(0.0 as double), (acc, v) -> acc + v)
        / (sqrt(aggregate($a, cast(0.0 as double),
                 (acc, v) -> acc + cast(v as double) * cast(v as double)))
         * sqrt(aggregate($b, cast(0.0 as double),
                 (acc, v) -> acc + cast(v as double) * cast(v as double))))"""

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, sim, rank) with deterministic
    * (sim desc, id asc) ranking.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"),
      F.col(vecCol).as("qvec"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(vecCol).as("cvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    c.join(F.broadcast(q), F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("sim",
        F.round(cosineF(F.col("qvec"), F.col("cvec")), 6))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the top-k most-similar corpus vectors with a DIFFERENT label —
    * the negatives that actually teach the model. Same broadcast
    * shape as [[bruteForceKnn]] (queries broadcast, corpus never
    * shuffles); the label-mismatch predicate prunes inside the join.
    * Output: (query_id, neighbor_id, sim, rank).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"),
      F.col(vecCol).as("qvec"), F.col(labelCol).as("__qlab"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(vecCol).as("cvec"), F.col(labelCol).as("__clab"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    c.join(F.broadcast(q), F.col("__clab") =!= F.col("__qlab"))
      .withColumn("sim",
        F.round(cosineF(F.col("qvec"), F.col("cvec")), 6))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Per-label (feature, dimension) z-normalization — the embedding
    * whitening pass before similarity search or clustering when
    * per-class feature scales differ. Two compact-key shuffles:
    * posexplode → (label, pos) partial-agg'd moments, join back, and a
    * per-vector summary aggregation. Output: (idCol, z_sum, z_min,
    * z_max) — rounded at 4 digits because z sums are parallel float
    * reductions (float policy).
    */
  def zNormalizeStats(corpus: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val ex = corpus.select(F.col(idCol), F.col(labelCol),
      F.posexplode(F.col(vecCol)).as(Seq("pos", "x")))
      .withColumn("x", F.col("x").cast("double"))
    val st = ex.groupBy(labelCol, "pos").agg(
      F.avg("x").as("mu"), F.stddev_samp(F.col("x")).as("sd"))
    // degenerate groups: Spark stddev_samp is NaN at n=1 where DuckDB
    // returns NULL, and a constant dimension gives sd=0 (division by
    // zero). Null the z value in BOTH cases — the oracle's
    // nullif(sd, 0) plus its native n=1 NULL produce the same rows,
    // and sum/min/max skip nulls identically on both engines.
    ex.join(st, Seq(labelCol, "pos"))
      .withColumn("__sd", F.when(F.isnan(F.col("sd"))
        || F.col("sd") === 0.0, F.lit(null)).otherwise(F.col("sd")))
      .withColumn("zv", (F.col("x") - F.col("mu")) / F.col("__sd"))
      .groupBy(idCol)
      .agg(F.round(F.sum("zv"), 4).as("z_sum"),
        F.round(F.min("zv"), 4).as("z_min"),
        F.round(F.max("zv"), 4).as("z_max"))
  }

  /** Per-label centroids (IVF coarse quantizer learned from the data):
    * posexplode embeddings → avg per (label, dim) → reassemble ordered.
    */
  def centroids(corpus: DataFrame, labelCol: String,
                vecCol: String): DataFrame =
    corpus
      .select(F.col(labelCol), F.posexplode(F.col(vecCol)).as(Seq("pos", "v")))
      .groupBy(labelCol, "pos")
      .agg(F.avg(F.expr("cast(v as double)")).as("cv"))
      .groupBy(labelCol)
      .agg(F.expr(
        "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
        .as("centroid"))

  /** IVF-style ANN: route each query to its `nprobe` nearest centroids,
    * then exact-rank only the vectors in those cells. At scale the
    * corpus is hash-partitioned (or bucketed) by cell id, so a probe
    * touches `nprobe/ncells` of the data instead of all of it.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, labelCol: String, k: Int,
             nprobe: Int): DataFrame = {
    val cents = centroids(corpus, labelCol, vecCol)
    val q = queries.select(F.col(idCol).as("query_id"),
      F.col(vecCol).as("qvec"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(F.col("csim").desc, F.col(labelCol).asc)
    val probes = q.crossJoin(F.broadcast(cents))
      .withColumn("cf", F.expr("transform(centroid, x -> cast(x as float))"))
      .withColumn("csim", cosineF(F.col("qvec"), F.col("cf")))
      .withColumn("crank", F.row_number().over(probeW))
      .filter(F.col("crank") <= nprobe)
      .select(F.col("query_id"), F.col("qvec"), F.col(labelCol))
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(vecCol).as("cvec"), F.col(labelCol))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    c.join(F.broadcast(probes), Seq(labelCol))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("sim",
        F.round(cosineF(F.col("qvec"), F.col("cvec")), 6))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic k-means (Lloyd) coarse-quantizer training — IVF
    * without a label column. Seeds are the k corpus vectors with the
    * smallest xxhash64(id) (a deterministic uniform sample, no RNG
    * state); each iteration assigns by max cosine against the broadcast
    * centroid table and recomputes centroids with posexplode+avg. Every
    * step is a partial-agg'd DataFrame op: the corpus never shuffles —
    * per iteration it is scanned once, and the shuffle carries
    * (cell, dim, partial-sum) rows, independent of corpus size.
    * Output: (cell, centroid: array<double>); cells that lose all
    * members drop out (k is an upper bound, standard Lloyd behavior).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): DataFrame = {
    val seeds = corpus
      .select(F.col(idCol), F.col(vecCol))
      .withColumn("__hk", F.xxhash64(F.col(idCol)))
      .orderBy("__hk").limit(k) // k rows — TakeOrderedAndProject
      .select(F.expr("transform(" + vecCol + ", x -> cast(x as double))")
        .as("centroid"))
      .withColumn("cell",
        F.row_number().over(Window.orderBy(F.col("centroid"))) - 1)
      .select("cell", "centroid")
    (1 to iters).foldLeft(seeds) { (cents, _) =>
      // Lloyd update = the per-label centroid build over the current
      // assignment (ONE implementation, see [[centroids]]).
      centroids(assignCells(corpus, cents, idCol, vecCol), "cell", vecCol)
        // localCheckpoint: k×dim rows — truncates the per-iteration
        // lineage so the final plan doesn't nest `iters` scans deep
        .localCheckpoint()
    }
  }

  /** Nearest-centroid cell assignment (broadcast centroids, argmax
    * cosine with a deterministic lowest-cell tiebreak). */
  def assignCells(corpus: DataFrame, cents: DataFrame, idCol: String,
                  vecCol: String): DataFrame = {
    val cf = cents.withColumn("cf",
      F.expr("transform(centroid, x -> cast(x as float))"))
    corpus.crossJoin(F.broadcast(cf))
      .withColumn("__sim", cosineF(F.col(vecCol), F.col("cf")))
      .groupBy(F.col(idCol))
      .agg(
        F.min(F.struct((-F.col("__sim")).as("ns"), F.col("cell"))).as("m"),
        F.first(F.col(vecCol)).as(vecCol))
      .select(F.col(idCol), F.col(vecCol), F.col("m.cell").as("cell"))
  }

  /** Label-free IVF: train a k-means coarse quantizer, assign cells,
    * then route queries with [[ivfKnn]]'s machinery over the learned
    * cells. At scale the assigned corpus is written bucketed by `cell`
    * so a probe reads only its cells' buckets. */
  def ivfKnnAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, nprobe: Int, ncells: Int,
                 iters: Int = 5): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, ncells, iters)
    val assigned = assignCells(corpus, cents, idCol, vecCol)
    ivfKnn(assigned, queries, idCol, vecCol, "cell", k, nprobe)
  }

  /** Pairs of near-duplicate embeddings (cosine >= threshold) within a
    * blocking column — the embedding-space analog of Dedup. */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val a = corpus.select(F.col(idCol).as("id1"), F.col(vecCol).as("v1"),
      F.col(blockCol))
    val b = corpus.select(F.col(idCol).as("id2"), F.col(vecCol).as("v2"),
      F.col(blockCol))
    a.join(b, Seq(blockCol))
      .filter(F.col("id1") < F.col("id2"))
      .withColumn("sim", F.round(cosineF(F.col("v1"), F.col("v2")), 6))
      .filter(F.col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }
}
