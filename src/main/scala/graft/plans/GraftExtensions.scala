package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** SparkSessionExtensions registration — SURVEY §7.3 path (c): expose
  * the graft custom expressions to SQL so `spark.sql("... graft_erf(x)
  * ...")` plans them like any built-in (codegen included).
  *
  * Use via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
}

object GraftExtensions {
  // The expressions take raw doubles / float arrays; SQL call sites may
  // pass decimals or double arrays, so the builders insert the casts
  // that ImplicitCastInputTypes would (that API is private[sql]).
  private def d(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  private def fa(e: Expression): Expression =
    if (e.dataType == ArrayType(FloatType)) e
    else Cast(e, ArrayType(FloatType))

  private def unary(name: String, f: Expression => Expression,
                    cast: Expression => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      require(args.length == 1, s"$name takes 1 argument")
      f(cast(args.head))
    }
  private def binary(name: String, f: (Expression, Expression) => Expression,
                     cast: Expression => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (args: Seq[Expression]) =>
      require(args.length == 2, s"$name takes 2 arguments")
      f(cast(args(0)), cast(args(1)))
    }

  private def st(e: Expression): Expression =
    if (e.dataType == org.apache.spark.sql.types.StringType) e
    else Cast(e, org.apache.spark.sql.types.StringType)
  private def lg(e: Expression): Expression =
    if (e.dataType == org.apache.spark.sql.types.LongType) e
    else Cast(e, org.apache.spark.sql.types.LongType)

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    unary("graft_erf", Erf, d),
    unary("graft_erfc", Erfc, d),
    unary("graft_digamma", Digamma, d),
    unary("graft_lgamma", LogGamma, d),
    unary("graft_vec_norm", NormF, fa),
    binary("graft_cosine", CosineSimF, fa),
    binary("graft_dot", DotProductF, fa),
    unary("graft_tokens", WordTokens, st),
    unary("graft_packed_trigrams", PackedTrigrams, st),
    binary("graft_zvalue", ZValue2, lg),
    // graft_shingles(text, n): n must be a foldable int literal
    "graft_shingles" -> { (args: Seq[Expression]) =>
      require(args.length == 2 && args(1).foldable,
        "graft_shingles takes (text, literal n)")
      WordShingles(st(args(0)),
        args(1).eval().asInstanceOf[Number].intValue())
    })

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
