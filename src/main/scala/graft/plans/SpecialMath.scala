package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Special functions missing from `org.apache.spark.sql.functions`
  * (SURVEY §2.9: erf, erfc, digamma, lgamma) as codegen'd Catalyst
  * expressions — SURVEY §7.3 "custom Expression candidates".
  *
  * erf/erfc use Abramowitz & Stegun 7.1.26 (|ε| ≤ 1.5e-7); digamma uses
  * a 6-step recurrence shift + asymptotic series. The DuckDB oracles
  * mirror THE SAME formulas term-by-term, so results match bit-for-bit
  * up to libm exp/ln ulps (absorbed by round-to-6).
  */
object SpecialMath {
  // A&S 7.1.26 constants
  private val p = 0.3275911
  private val a1 = 0.254829592
  private val a2 = -0.284496736
  private val a3 = 1.421413741
  private val a4 = -1.453152027
  private val a5 = 1.061405429

  def erf(x: Double): Double = {
    val s = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + p * ax)
    val poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    s * (1.0 - poly * math.exp(-ax * ax))
  }

  def erfc(x: Double): Double = 1.0 - erf(x)

  /** ψ(x) for x > 0: shift to y = x+6 then asymptotic expansion. */
  def digamma(x: Double): Double = {
    var r = 0.0
    var xx = x
    var i = 0
    while (i < 6) { r -= 1.0 / xx; xx += 1.0; i += 1 }
    val inv = 1.0 / xx
    val inv2 = inv * inv
    r + math.log(xx) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
  }

  /** Lanczos log-gamma (g=7, n=9) for x > 0. */
  private val lg = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lgamma(x: Double): Double = {
    val xm = x - 1.0
    var a = lg(0)
    val t = xm + 7.5
    var i = 1
    while (i < 9) { a += lg(i) / (xm + i); i += 1 }
    0.5 * math.log(2.0 * math.Pi) + (xm + 0.5) * math.log(t) - t + math.log(a)
  }

  /** DuckDB-SQL mirror of `erf` (identical constant/op order). */
  def erfSql(col: String): String =
    s"""(CASE WHEN $col < 0 THEN -1.0 ELSE 1.0 END) *
        (1.0 - (((((($a5) * (1.0/(1.0+$p*abs($col))) + ($a4))
                 * (1.0/(1.0+$p*abs($col))) + ($a3))
                 * (1.0/(1.0+$p*abs($col))) + ($a2))
                 * (1.0/(1.0+$p*abs($col))) + ($a1))
                 * (1.0/(1.0+$p*abs($col))))
              * exp(-abs($col)*abs($col)))"""

  /** DuckDB-SQL mirror of `digamma` (6-step shift + same series). */
  def digammaSql(col: String): String = {
    val y = s"($col + 6.0)"
    val shift = (0 until 6).map(k => s"1.0/($col + $k)").mkString(" - ", " - ", "")
    s"""(ln($y) - 0.5/$y
        - (1.0/($y*$y)) * (1.0/12.0 - (1.0/($y*$y)) * (1.0/120.0 - (1.0/($y*$y))/252.0))
        $shift)"""
  }
}

abstract class MathUnary extends UnaryExpression {
  override def dataType: DataType = DoubleType
  protected def fn: String
  override def nullSafeEval(v: Any): Any =
    eval1(v.asInstanceOf[Double])
  protected def eval1(x: Double): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.plans.SpecialMath.$fn($x)")
}

case class Erf(child: Expression) extends MathUnary {
  override protected def fn = "erf"
  override protected def eval1(x: Double): Double = SpecialMath.erf(x)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
case class Erfc(child: Expression) extends MathUnary {
  override protected def fn = "erfc"
  override protected def eval1(x: Double): Double = SpecialMath.erfc(x)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
case class Digamma(child: Expression) extends MathUnary {
  override protected def fn = "digamma"
  override protected def eval1(x: Double): Double = SpecialMath.digamma(x)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
case class LogGamma(child: Expression) extends MathUnary {
  override protected def fn = "lgamma"
  override protected def eval1(x: Double): Double = SpecialMath.lgamma(x)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MathFunctions {
  private def c(e: Expression) = GraftColumnBridge.column(e)
  private def e(col: Column) =
    GraftColumnBridge.expression(col.cast("double"))
  def erf(x: Column): Column = c(Erf(e(x)))
  def erfc(x: Column): Column = c(Erfc(e(x)))
  def digamma(x: Column): Column = c(Digamma(e(x)))
  def lgammaC(x: Column): Column = c(LogGamma(e(x)))
}
