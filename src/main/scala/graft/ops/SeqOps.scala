package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Sequence / running-window operators — SURVEY.md §2.5.
  *
  * The reference's cum* and diff ops are whole-column over implicit row
  * order (src/operators.jl:58-60); row order is not a Spark concept, so
  * every operator here takes explicit partition + order keys and lowers
  * to a window frame. Partitioned windows scale (state is per-key and
  * runs after a hash shuffle on the partition keys); an UNPARTITIONED
  * ordered window is a single-task bottleneck and deliberately requires
  * the caller to pass `partitionBy = Nil` explicitly.
  */
object SeqOps {

  private def spec(partitionBy: Seq[String], orderBy: Seq[String]): WindowSpec = {
    val w = if (partitionBy.isEmpty) Window.partitionBy()
            else Window.partitionBy(partitionBy.map(F.col): _*)
    w.orderBy(orderBy.map(F.col): _*)
  }

  private def running(fn: Column => Column, col: String,
                      partitionBy: Seq[String], orderBy: Seq[String]): Column =
    fn(F.col(col)).over(spec(partitionBy, orderBy)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  implicit class SeqDF(val df: DataFrame) extends AnyVal {

    /** cumsum (reference src/operators.jl:60). */
    def cumsum(col: String, out: String, partitionBy: Seq[String],
               orderBy: Seq[String]): DataFrame =
      df.withColumn(out, running(F.sum, col, partitionBy, orderBy))

    /** cummin / cummax. */
    def cummin(col: String, out: String, partitionBy: Seq[String],
               orderBy: Seq[String]): DataFrame =
      df.withColumn(out, running(F.min, col, partitionBy, orderBy))

    def cummax(col: String, out: String, partitionBy: Seq[String],
               orderBy: Seq[String]): DataFrame =
      df.withColumn(out, running(F.max, col, partitionBy, orderBy))

    /** cumprod: no product aggregate in Spark — exact rewrite
      * exp(running sum of ln|x|) with sign/zero bookkeeping kept simple
      * here (positive inputs), matching the reference's float cumprod.
      */
    def cumprod(col: String, out: String, partitionBy: Seq[String],
                orderBy: Seq[String]): DataFrame =
      df.withColumn(out,
        F.exp(F.sum(F.log(F.col(col))).over(spec(partitionBy, orderBy)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))

    /** diff: x - lag(x) (reference src/operators.jl:58). First row per
      * partition = null (the reference drops it; callers filter). */
    def diff(col: String, out: String, partitionBy: Seq[String],
             orderBy: Seq[String]): DataFrame =
      df.withColumn(out,
        F.col(col) - F.lag(F.col(col), 1).over(spec(partitionBy, orderBy)))

    /** percent_change / reldiff (reference src/DataFrames.jl:121,130).
      * A zero previous value yields null (not an ANSI divide-by-zero
      * error): `nullif(prev, 0)` — same as DuckDB's x/0 → NULL. */
    def percentChange(col: String, out: String, partitionBy: Seq[String],
                      orderBy: Seq[String]): DataFrame = {
      val prev = F.lag(F.col(col), 1).over(spec(partitionBy, orderBy))
      df.withColumn(out, (F.col(col) - prev) / F.nullif(prev, F.lit(0)))
    }

    /** sortperm as a column: rank of each row under the given ordering
      * (reference src/dataframe.jl:1540-1852; `sortperm`).
      *
      * Partitioned → per-key window after a hash shuffle (scales).
      * Unpartitioned (global sortperm) → range-partitioned sort +
      * per-partition offsets via [[RelOps.globalRowNumber]]; an
      * unpartitioned row_number window would funnel every row through
      * one task. */
    def rankBy(out: String, partitionBy: Seq[String],
               orderings: RelOps.Ordering*): DataFrame =
      if (partitionBy.isEmpty)
        RelOps.globalRowNumber(df, out, orderings)
      else {
        val w0 = Window.partitionBy(partitionBy.map(F.col): _*)
        df.withColumn(out,
          F.row_number().over(w0.orderBy(orderings.map(_.toColumn): _*)))
      }
  }
}
