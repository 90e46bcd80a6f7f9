package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key (the time-series join
  * Spark SQL lacks; DuckDB/kdb/pandas `merge_asof` semantics,
  * inclusive).
  *
  * Built by COMPOSITION (SURVEY §7 preference (a), before any custom
  * SparkPlan): tag-union both sides, one window per key ordered by
  * (ts, rightFirst) carrying the last right payload forward, keep left
  * rows. ONE shuffle on the key — the same cost as the sort-merge pass
  * a native as-of exec would do, with Catalyst/AQE still free to
  * optimize around it. Carried payloads ride a single struct column so
  * the window state is one value regardless of payload width.
  *
  * Tie policy: when multiple right rows share the same (keyCols,
  * tsCol), the one with the GREATEST payload struct (field-by-field
  * struct ordering over `valueCols`) wins — the window ordering ends
  * with the payload column, so the pick is deterministic across runs
  * and partitionings rather than "whichever row the shuffle delivered
  * last". Consequence: `valueCols` must be orderable types (no maps).
  */
object AsOfJoin {

  /** @param left       left/probe table
    * @param right      right/quote table (its `valueCols` are emitted)
    * @param keyCols    equi-key columns (same names both sides)
    * @param tsCol      time column (same name both sides, orderable)
    * @param valueCols  right-side payload columns to carry (emitted
    *                   with an `asof_` prefix, null when no prior row)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = F.struct(valueCols.map(F.col): _*)
    val r = right.select(
      (keyCols :+ tsCol).map(F.col) :+ payload.as("__p") :+
        F.lit(1).as("__r"): _*)
    val l = left
      .withColumn("__p", F.lit(null).cast(r.schema("__p").dataType))
      .withColumn("__r", F.lit(0))
      .select((keyCols :+ tsCol).map(F.col) ++
        leftCols.filterNot((keyCols :+ tsCol).contains).map(F.col) ++
        Seq(F.col("__p"), F.col("__r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts → inclusive (<=);
    // trailing __p asc makes tied right rows resolve to max payload
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).asc, F.col("__r").desc, F.col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__last",
      F.last(F.col("__p"), ignoreNulls = true).over(w))
    carried.filter(F.col("__r") === 0)
      .select(leftCols.map(F.col) ++
        valueCols.map(c => F.col(s"__last.$c").as(s"asof_$c")): _*)
  }

  /** [[backward]] with a staleness bound (pandas
    * `merge_asof(tolerance=...)`): a prior right row older than `tol`
    * (in `tsCol` units — pass epoch seconds) yields NULL instead of a
    * stale match. Same single-shuffle composition; the right timestamp
    * rides the carried struct so the bound is a per-row projection,
    * not a second join.
    */
  def backwardWithin(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], tsCol: String,
                     valueCols: Seq[String], tol: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = F.struct(
      valueCols.map(F.col) :+ F.col(tsCol).as("__rts"): _*)
    val r = right.select(
      (keyCols :+ tsCol).map(F.col) :+ payload.as("__p") :+
        F.lit(1).as("__r"): _*)
    val l = left
      .withColumn("__p", F.lit(null).cast(r.schema("__p").dataType))
      .withColumn("__r", F.lit(0))
      .select((keyCols :+ tsCol).map(F.col) ++
        leftCols.filterNot((keyCols :+ tsCol).contains).map(F.col) ++
        Seq(F.col("__p"), F.col("__r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).asc, F.col("__r").desc, F.col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__last",
      F.last(F.col("__p"), ignoreNulls = true).over(w))
    carried.filter(F.col("__r") === 0)
      .select(leftCols.map(F.col) ++ valueCols.map(c =>
        F.when(F.col(tsCol) - F.col("__last.__rts") <= tol,
          F.col(s"__last.$c")).as(s"asof_$c")): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row
    * with `right.ts >= left.ts` in the same key (inclusive): the
    * "next quote" / lead-lookup mirror of [[backward]]. Identical
    * single-shuffle composition with the window order reversed —
    * carrying the last right payload over descending time IS the next
    * right row in ascending time. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = F.struct(valueCols.map(F.col): _*)
    val r = right.select(
      (keyCols :+ tsCol).map(F.col) :+ payload.as("__p") :+
        F.lit(1).as("__r"): _*)
    val l = left
      .withColumn("__p", F.lit(null).cast(r.schema("__p").dataType))
      .withColumn("__r", F.lit(0))
      .select((keyCols :+ tsCol).map(F.col) ++
        leftCols.filterNot((keyCols :+ tsCol).contains).map(F.col) ++
        Seq(F.col("__p"), F.col("__r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts → inclusive (>=)
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).desc, F.col("__r").desc, F.col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__next",
      F.last(F.col("__p"), ignoreNulls = true).over(w))
    carried.filter(F.col("__r") === 0)
      .select(leftCols.map(F.col) ++
        valueCols.map(c => F.col(s"__next.$c").as(s"asof_$c")): _*)
  }
}
