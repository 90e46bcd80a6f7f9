package graft

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.{functions => F}

/** Pins the corpus-wide floor-form rounding policy's SEMANTICS
  * (round-14 verdict task 3 + the Dedup.scala:98 advice item): every
  * `round(x, d)`-of-a-ratio in the 348-query corpus is expressed as
  * `floor(x·10^d + 0.5) / 10^d` IDENTICALLY on the Spark and DuckDB
  * sides, because the two engines' native round() disagree on exact
  * d-dp halves (banker's vs HALF_UP vs float drift). The contract this
  * spec pins, on a grid dense in exact halves (both signs,
  * d ∈ {0,2,3,4,6}):
  *
  *  1. the floor form is round-half-toward-+INFINITY applied to the
  *     double product fl(x·10^d): for every grid point,
  *     floor-form == floor(exact(prod) + 1/2) computed in exact
  *     BigDecimal arithmetic on the double product's true value
  *     (verified programmatically — the double `+ 0.5` introduces no
  *     drift anywhere on the grid);
  *  2. on NON-half points it therefore agrees with BigDecimal
  *     HALF_UP everywhere;
  *  3. on exact POSITIVE halves it agrees with HALF_UP (away from
  *     zero == toward +inf for positives);
  *  4. on exact NEGATIVE halves it DIVERGES from HALF_UP by exactly
  *     +1·10^-d — toward +inf, not away from zero. This divergence is
  *     deliberate and must hold on BOTH engines; a partial reversion
  *     to native round() on either side reopens the knife edge.
  *
  * The CROSS-ENGINE half of the contract — the same expression
  * bit-matching DuckDB on the same grid — is the oracle-gated
  * q350_floor_policy row (MiscQueries), re-verified by the driver at
  * sf0.01 every round and by the sf0.1 sweep. This spec is the
  * engine-side semantic pin; together they make the policy itself
  * un-driftable, not just the queries that use it.
  *
  * A Spark-expression leg (same grid through F.floor, sampled) guards
  * against Catalyst constant-folding or codegen ever diverging from
  * the JVM double semantics assumed here.
  */
class FloorPolicySpec extends SparkSpec {

  private val dps = Seq(0 -> 1.0, 2 -> 100.0, 3 -> 1000.0,
    4 -> 10000.0, 6 -> 1000000.0)

  /** The policy, as every corpus site computes it (pure doubles). */
  private def floorForm(x: Double, p: Double): Double =
    math.floor(x * p + 0.5) / p

  /** Exact value of a double, no decimal-literal laundering. */
  private def exact(d: Double): JBD = new JBD(d)

  test("floor form is half-toward-+inf on the double product " +
      "(exact BigDecimal check, full grid)") {
    val half = new JBD("0.5")
    for ((_, p) <- dps; k <- -8001 to 8001) {
      val x = k / (2.0 * p)
      val prod = x * p
      val got = math.floor(prod + 0.5)
      val want = exact(prod).add(half)
        .setScale(0, RoundingMode.FLOOR).doubleValue()
      assert(got == want,
        s"k=$k p=$p prod=$prod: floor(prod+0.5)=$got != " +
          s"exact half-ceiling $want — double +0.5 drifted")
    }
  }

  test("agrees with BigDecimal HALF_UP on non-halves; positive " +
      "halves HALF_UP; negative halves diverge toward +inf by 10^-d") {
    var halvesPos = 0
    var halvesNeg = 0
    for ((d, p) <- dps; k <- -8001 to 8001) {
      val x = k / (2.0 * p)
      val prod = x * p
      // classify on the double product's exact value — the engines
      // only ever see the double, so a k/2 that did not survive the
      // IEEE round-trip is a non-half for policy purposes
      val isHalf = exact(prod).remainder(JBD.ONE).abs()
        .compareTo(new JBD("0.5")) == 0
      // compare at the PRE-division integer stage: both sides there
      // are exact small integers, so == is meaningful; comparing the
      // scaled forms would re-introduce double-sum noise
      // (-3.0/100 + 1.0/100 != -2.0/100) into the spec itself
      val gotInt = math.floor(prod + 0.5)
      val halfUpInt = exact(prod).setScale(0, RoundingMode.HALF_UP)
        .doubleValue()
      assert(floorForm(x, p) == gotInt / p) // definitional tie-back
      if (!isHalf || prod > 0) {
        assert(gotInt == halfUpInt,
          s"k=$k d=$d: floor form $gotInt != HALF_UP $halfUpInt")
        if (isHalf) halvesPos += 1
      } else {
        assert(gotInt == halfUpInt + 1.0,
          s"k=$k d=$d: negative half — floor form $gotInt should sit " +
            s"exactly 1 above HALF_UP $halfUpInt (toward +inf)")
        halvesNeg += 1
      }
    }
    // the grid must actually exercise the knife edge in BOTH signs —
    // a future grid edit that silently drops the halves would turn
    // this spec into a tautology
    assert(halvesPos > 1000, s"only $halvesPos positive halves on grid")
    assert(halvesNeg > 1000, s"only $halvesNeg negative halves on grid")
  }

  test("Catalyst F.floor expression matches the JVM double " +
      "semantics (sampled grid through a real plan)") {
    val rows = spark.range(-801L, 802L).toDF("k")
      .select(F.col("k"), F.explode(F.array(
        dps.map { case (d, p) =>
          F.struct(F.lit(d).as("d"), F.lit(p).as("p"))
        }: _*)).as("e"))
      .select(F.col("k"), F.col("e.d").as("d"), F.col("e.p").as("p"),
        (F.floor(F.col("k").cast("double") / (F.lit(2.0) * F.col("e.p"))
          * F.col("e.p") + 0.5) / F.col("e.p")).as("r"))
      .collect()
    assert(rows.length == 1603 * dps.size)
    rows.foreach { r =>
      val k = r.getLong(0); val p = r.getDouble(2)
      val want = floorForm(k / (2.0 * p), p)
      assert(r.getDouble(3) == want,
        s"k=$k p=$p: plan gave ${r.getDouble(3)}, JVM gives $want")
    }
  }
}
