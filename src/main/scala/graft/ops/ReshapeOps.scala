package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Reshaping: stack/melt (wide→long) and unstack/pivot_table (long→wide)
  * — SURVEY.md §2.8, reference src/reshape.jl.
  *
  * stack uses the codegen'd `stack()` table function (one scan, no
  * shuffle — the long form is produced partition-locally). unstack/pivot
  * ride Spark's `RelationalGroupedDataset.pivot` with an EXPLICIT level
  * list: at 100 TB the implicit variant needs an extra distinct-collect
  * job over the full table, so callers pass the levels when they know
  * them.
  */
object ReshapeOps {

  implicit class ReshapeDF(val df: DataFrame) extends AnyVal {

    /** wide→long (reference stack, src/reshape.jl:16-24): one row per
      * (id, measure) pair with `variable`/`value` columns. Measure
      * columns are cast to double (the reference's common-eltype vcat
      * promotion, src/dataframe.jl:1045-1076).
      */
    def stackCols(measureVars: Seq[String], idVars: Seq[String]): DataFrame = {
      val pairs = measureVars
        .map(m => s"'$m', cast($m as double)").mkString(", ")
      val n = measureVars.size
      df.select(
        idVars.map(F.col) :+
          F.expr(s"stack($n, $pairs) as (variable, value)"): _*)
    }

    /** melt = stack of the complement columns (reference src/reshape.jl:26). */
    def melt(idVars: Seq[String]): DataFrame =
      stackCols(df.columns.filterNot(idVars.contains).toSeq, idVars)

    /** long→wide (reference unstack, src/reshape.jl:35-63): one column
      * per level of `colKey`; duplicate cells resolve last-write-wins in
      * the reference — reproduced here by `last(value)` within pivot.
      * With no deterministic "last" in a distributed table, callers give
      * `orderCols` forming a total order; we take the value of the max
      * row via max_by over the order tuple (exact reference semantics
      * under an explicit order).
      */
    def unstack(rowKeys: Seq[String], colKey: String, value: String,
                levels: Seq[String], orderCols: Seq[String]): DataFrame =
      df.groupBy(rowKeys.map(F.col): _*)
        .pivot(colKey, levels)
        .agg(F.expr(
          s"max_by($value, struct(${orderCols.mkString(", ")}))"))

    /** pivot_table (reference src/reshape.jl:78-103): `by`-aggregate then
      * spread `colKey` levels into columns. `agg` is any SQL aggregate
      * over the value column, e.g. "round(avg(l_quantity), 6)".
      */
    def pivotTable(rowKeys: Seq[String], colKey: String,
                   levels: Seq[String], agg: String): DataFrame =
      df.groupBy(rowKeys.map(F.col): _*)
        .pivot(colKey, levels)
        .agg(F.expr(agg))

    /** Cross-tabulation (reference xtab/xtabs, exports
      * src/DataFrames.jl:162-163): counts spread wide, absent combos = 0
      * (not null) to match contingency-table semantics.
      */
    def xtab(rowKey: String, colKey: String, levels: Seq[String]): DataFrame = {
      val p = df.groupBy(F.col(rowKey)).pivot(colKey, levels).count()
      p.select(F.col(rowKey) +:
        levels.map(l => F.coalesce(F.col(s"`$l`"), F.lit(0L)).as(l)): _*)
    }
  }
}
