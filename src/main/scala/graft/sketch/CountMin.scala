package graft.sketch

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.CounterArrayAgg

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a 64-bit
  * element-hash column — approximate frequencies with ONE-SIDED error:
  * `estimate >= true count` always, and
  * `estimate <= true + eps * N` with probability `1 - (1/e')^depth`
  * per query (e' = the slack factor over N/width).
  *
  * At 100 TB this replaces the exact (token, count) shuffle with a
  * `depth × width` counter array (256 KB at 4 × 8192) built in one
  * partial-agg'd scan — each map task counts locally and ships one
  * array — and broadcast to wherever frequencies are probed. The same
  * xor+rehash family as [[graft.text.Bloom]]/MinHash computes cell
  * indices in the PLAN, so build and probe share one definition.
  */
object CountMin {

  private def consts(depth: Int): String =
    (0 until depth)
      .map(r => s"${(r + 101) * 0x9E3779B97F4A7C15L}L").mkString(", ")

  /** `array<int>` of the `depth` ABSOLUTE cell indices (row-major
    * `r * width + pos_r`) of a pre-hashed element expression. */
  def cellsOfHashExpr(hExpr: String, width: Int, depth: Int): String =
    s"""transform(array(${consts(depth)}),
          (c, r) -> cast(r * $width
                         + pmod(xxhash64(($hExpr) ^ c), ${width}L)
                         as int))"""

  /** Build a 1-row DataFrame holding the sketch (`cm`,
    * `array<bigint>` of depth×width counters) of every value of
    * `hashCol` (one bump per ROW — pre-hash and keep duplicates:
    * frequencies are the point). */
  def build(df: DataFrame, hashCol: String, width: Int,
            depth: Int): DataFrame =
    df.select(F.explode(
        F.expr(cellsOfHashExpr(hashCol, width, depth))).as("__i"))
      .agg(CounterArrayAgg.counters(F.col("__i"), width * depth).as("cm"))

  /** Frequency estimate of a pre-hashed element: min over the `depth`
    * cells (1-indexed `element_at`). */
  def estimateExpr(cmCol: String, hExpr: String, width: Int,
                   depth: Int): String =
    s"""array_min(transform(
          ${cellsOfHashExpr(hExpr, width, depth)},
          i -> element_at($cmCol, i + 1)))"""
}
