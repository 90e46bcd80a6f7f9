package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.StructType

/** Closure-form escape hatches — SURVEY §2.11: the reference lets users
  * run arbitrary Julia functions per group (`by(df, cols, f)`,
  * src/grouping.jl:248) and per row (`map(f, EachRow(df))`,
  * src/dataframe.jl:1916-1926). Spark equivalents: typed
  * `flatMapGroups` (UDTF-per-group) and `Dataset.map`.
  *
  * These bypass Catalyst optimization for the closure body — use the
  * declarative ops whenever the logic is relational (SURVEY §7.1 "no
  * UDFs on the hot path"); they exist because full parity includes the
  * arbitrary-code form. Grouping still shuffles ONCE on the key like
  * any aggregate.
  */
object TypedOps {

  implicit class TypedDF(val df: DataFrame) extends AnyVal {

    /** `by(df, cols, f)` closure form: f sees all rows of a group and
      * returns any number of result rows (reference group→DataFrame
      * function). Output schema supplied explicitly (Spark cannot infer
      * schemas from untyped closures).
      */
    def byClosure(keyCol: String, outSchema: StructType)(
        f: (String, Iterator[Row]) => Iterator[Row]): DataFrame = {
      implicit val rowEnc: Encoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(outSchema))
      implicit val strEnc: Encoder[String] =
        org.apache.spark.sql.Encoders.STRING
      df.groupByKey(_.getAs[Any](keyCol).toString)
        .flatMapGroups((k: String, it: Iterator[Row]) => f(k, it))
    }

    /** `map(f, EachRow(df))`: row iteration into a typed Dataset. */
    def mapRows[T: Encoder](f: Row => T): Dataset[T] = df.map(f)
  }
}
