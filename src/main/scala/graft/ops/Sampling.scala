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
}
