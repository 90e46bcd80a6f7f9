package graft.similarity

import org.apache.spark.sql.{DataFrame, functions => F}

/** Embedding quantization for storage — the int8 compression a 100 TB
  * vector corpus ships with (4× smaller than float32, ~1% recall cost
  * at IVF scale). Symmetric per-vector scaling:
  * q = floor(x * 127 / max|x| + 0.5), dequant = q * max|x| / 127.
  *
  * floor(x + 0.5) is used instead of round() so both engines (and the
  * oracle) share ONE rounding rule regardless of their round()
  * half-case conventions.
  */
object Quantize {

  /** Add `qvec` (array<int>, int8-ranged) and `scale` columns. */
  def int8(df: DataFrame, vecCol: String): DataFrame =
    df
      .withColumn("__maxabs", F.expr(
        s"""aggregate($vecCol, cast(0.0 as double),
             (a, x) -> greatest(a, abs(cast(x as double))))"""))
      // zero guard: an all-zero vector has maxabs 0 — x/0 is Inf and an
      // ANSI cast of Inf to int throws; emit qvec of zeros and scale 0
      // (the oracle mirrors the same CASE).
      .withColumn("qvec", F.expr(
        s"""transform($vecCol, x ->
              if(__maxabs = 0.0d, 0,
                 cast(floor(cast(x as double) * 127.0 / __maxabs + 0.5)
                      as int)))"""))
      .withColumn("scale", F.col("__maxabs") / 127.0)
      .drop("__maxabs")

  /** Reconstruct doubles from a quantized vector. */
  def dequant(df: DataFrame, qCol: String, scaleCol: String): DataFrame =
    df.withColumn("dqvec", F.expr(
      s"transform($qCol, q -> q * $scaleCol)"))
}
