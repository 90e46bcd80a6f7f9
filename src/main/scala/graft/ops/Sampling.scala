package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Deterministic sampling for reproducible pipeline runs: hash the key
  * and keep a fixed slice of hash space. Unlike `df.sample` this is
  * stable across runs, partitionings and Spark versions, and unlike
  * modulo-of-key it is uniform even when keys are clustered. The
  * standard way a 100 TB training-data pipeline carves dev/eval slices.
  */
object Sampling {

  /** Keep ~`rate` of rows, decided by xxhash64(keyCol, seed). */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 seed: Long = 42L): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate out of [0,1]")
    val buckets = 1000000L
    val keep = (rate * buckets).toLong
    df.filter(
      F.pmod(F.xxhash64(F.col(keyCol), F.lit(seed)), F.lit(buckets))
        < F.lit(keep))
  }

  /** Stratified deterministic sampling: per-stratum rate map. */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
                           strataCol: String,
                           rates: Map[String, Double],
                           seed: Long = 42L): DataFrame = {
    val buckets = 1000000L
    val keepExpr = rates.foldLeft(F.lit(0L)) { case (acc, (stratum, rate)) =>
      F.when(F.col(strataCol) === stratum,
        F.lit((rate * buckets).toLong)).otherwise(acc)
    }
    df.filter(
      F.pmod(F.xxhash64(F.col(keyCol), F.lit(seed)), F.lit(buckets))
        < keepExpr)
  }

  /** Per-row Bernoulli sampling with a PER-ROW rate — quality-weighted
    * downsampling (keep high-quality docs with probability ~1, low
    * quality at their score): keep iff uniform_hash(key) < rateCol.
    * Same determinism contract as [[hashSample]] (stable across runs
    * and partitionings); rate 0 drops, rate >= 1 keeps. */
  def bernoulliByRate(df: DataFrame, keyCol: String, rateCol: String,
                      seed: Long = 42L): DataFrame = {
    val buckets = 1000000L
    df.filter(
      F.pmod(F.xxhash64(F.col(keyCol), F.lit(seed)), F.lit(buckets))
        .cast("double") / buckets < F.col(rateCol))
  }

  /** Weighted sampling WITHOUT replacement, exactly k per group
    * (Efraimidis–Spirakis A-ES): key = u^(1/w) for uniform u, keep the
    * k largest keys — inclusion probability proportional to weight,
    * no sequential pass. Runs on the bounded-memory TopK aggregator
    * (O(groups × k) shuffle rows, like [[fixedSizePerGroup]]).
    *
    * `uCol` supplies the uniform draw; pass a hash-derived column for
    * reproducibility (and an oracle-computable one — e.g. a Knuth
    * multiplicative hash of the id — when the selection must be
    * verifiable outside Spark). Keys of distinct rows are separated
    * far beyond float-rounding noise for any non-degenerate u, so the
    * ranking is engine-portable; ties break on idCol.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String,
                             uCol: String, k: Int): DataFrame = {
    val scored = df
      .select((groupCols ++ Seq(idCol)).map(F.col) :+
        F.expr(s"pow($uCol, 1.0d / $weightCol)").as("__key"): _*)
    graft.similarity.TopK
      .perGroup[Long](scored, groupCols, "__key", idCol, k, "rnk")
      .drop("__key")
  }

  /** EXACTLY `k` rows per group (fewer if the group is smaller),
    * deterministically. Default: rank rows by xxhash64(key, seed)
    * inside each group and keep the k smallest — a reproducible
    * reservoir. With `scoreCol`, rank by THAT (desc, key asc) instead
    * and surface the score — eval-set carving by an explicit (and
    * oracle-computable) priority. Either way it runs on the
    * bounded-memory TopK aggregator, so the shuffle carries
    * O(groups × k) rows, not the corpus (rate-based sampling can't
    * promise per-group counts; eval-set carving wants exactly-k).
    * Output: groupCols (+ scoreCol) + keyCol + "rnk"; per-id payloads
    * join back on keyCol. */
  def fixedSizePerGroup(df: DataFrame, groupCols: Seq[String],
                        keyCol: String, k: Int,
                        seed: Long = 42L,
                        scoreCol: Option[String] = None): DataFrame =
    scoreCol match {
      // caller-supplied score: keep the k LARGEST (score desc, key asc)
      // per group and surface the score — eval-set carving by an
      // explicit (and oracle-computable) priority instead of the hash
      case Some(sc) =>
        graft.similarity.TopK.perGroup[Long](
          df.select((groupCols ++ Seq(keyCol, sc)).map(F.col): _*),
          groupCols, sc, keyCol, k, "rnk")
      case None =>
        val scored = df
          .select((groupCols :+ keyCol).map(F.col): _*)
          // negated hash as score: TopK keeps largest-score (desc)
          // first, so the k hash-smallest rows = top-k of the negation
          .withColumn("__score",
            -F.pmod(F.xxhash64(F.col(keyCol), F.lit(seed)), F.lit(1L << 40))
              .cast("double"))
        graft.similarity.TopK
          .perGroup[Long](scored, groupCols, "__score", keyCol, k, "rnk")
          .drop("__score")
    }
}
