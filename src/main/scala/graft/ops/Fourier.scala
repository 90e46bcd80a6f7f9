package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Discrete Fourier transform over keyed, explicitly-ordered series —
  * reference `colffts` (src/operators.jl:231-245 generated reduction
  * list, export src/DataFrames.jl). The reference FFTs a whole column
  * in implicit row order; relationally that is a per-group DFT under an
  * explicit ordering:
  *
  *   X_k = Σ_n x_n · e^(-2πi·k·n/N)  →  (re, im) via cos/sin sums.
  *
  * Plan shape: one per-group window for the index (hash shuffle on the
  * group key, scales), a K-way explode, one partially-aggregated
  * groupBy — work is rows×K with map-side combine, no single-task
  * stage. An O(N log N) FFT is pointless here: at cluster scale the
  * scan dominates, and k is small (spectral fingerprints, seasonality
  * checks); exactness against a plain-SQL oracle is what matters.
  */
object Fourier {

  /** First `k` DFT coefficients of `valCol` per group, series ordered
    * by `orderCols` (must be total within a group). Output: groupCols,
    * k, re, im. */
  def dftByGroup(df: DataFrame, groupCols: Seq[String],
                 orderCols: Seq[String], valCol: String,
                 k: Int): DataFrame = {
    // sequence(0, k-1) with k = 0 would emit [0, -1] (descending step)
    require(k > 0, s"dftByGroup needs k > 0 coefficients, got $k")
    val w = Window.partitionBy(groupCols.map(F.col): _*)
      .orderBy(orderCols.map(F.col): _*)
    val wAll = Window.partitionBy(groupCols.map(F.col): _*)
    // NOTE names __idx/__len, not n/N: both Spark's analyzer and the
    // SQL oracles resolve identifiers case-insensitively, so n vs N is
    // ONE name (and a DuckDB `n/N` silently became n/n → NULL row).
    df
      .withColumn("__idx", F.row_number().over(w).cast("double") - 1)
      .withColumn("__len", F.count(F.lit(1)).over(wAll).cast("double"))
      .select(groupCols.map(F.col) ++ Seq(
        F.col(valCol).cast("double").as("__x"),
        F.col("__idx"), F.col("__len"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).as("k")): _*)
      // identical arithmetic order to the SQL oracle:
      // -2 * pi() * k * idx / len
      .withColumn("__angle",
        F.expr("-2 * pi() * k * __idx / __len"))
      .groupBy((groupCols :+ "k").map(F.col): _*)
      .agg(
        F.sum(F.col("__x") * F.cos(F.col("__angle"))).as("re"),
        F.sum(F.col("__x") * F.sin(F.col("__angle"))).as("im"))
  }
}
