package graft

import org.apache.spark.sql.{functions => F}
import graft.formula.Formula

/** Function terms + I() arithmetic in the formula DSL (round-10
  * stretch task; reference expands arbitrary call expressions in
  * terms, src/formula.jl:67-125). */
class FormulaSpec extends SparkSpec {

  private def frame = {
    import spark.implicits._
    Seq((1.0, 2.0, 3.0, "a"), (4.0, 5.0, 6.0, "b"),
      (9.0, 8.0, 7.0, "a"), (16.0, 11.0, 13.0, "b"))
      .toDF("y", "c", "a", "g")
  }

  test("bare formulas are byte-identical after the expansion pass") {
    val (df2, f2) = Formula.expandFunctionTerms(frame,
      "y ~ c + a + g + c:a")
    assert(f2 == "y ~ c + a + g + c:a")
    assert(df2.columns.sameElements(frame.columns))
  }

  test("caret translation handles nesting and parenthesized operands") {
    assert(Formula.caretsToPower("a^2") == "power(a,2)")
    assert(Formula.caretsToPower("a^2 + b^3") ==
      "power(a,2) + power(b,3)")
    assert(Formula.caretsToPower("(a + b)^2") == "power((a + b),2)")
    assert(Formula.caretsToPower("a^2^3") == "power(power(a,2),3)")
  }

  test("log(c) + I(a^2) evaluate as design-matrix columns") {
    val got = Formula.modelMatrix(frame, "y ~ log(c) + I(a^2)")
      .orderBy("label").collect()
    assert(got.length == 4)
    val want = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0),
      (9.0, 8.0, 7.0), (16.0, 11.0, 13.0)).sortBy(_._1)
    got.zip(want).foreach { case (r, (y, c, a)) =>
      assert(r.getDouble(0) == y)
      assert(math.abs(r.getDouble(1) - math.log(c)) < 1e-12)
      assert(math.abs(r.getDouble(2) - a * a) < 1e-12)
    }
  }

  test("nested calls and function factors in interactions") {
    val got = Formula.modelMatrix(frame, "y ~ sqrt(log(c) + 1) + I(a^2):c")
      .orderBy("label").collect()
    val want = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0),
      (9.0, 8.0, 7.0), (16.0, 11.0, 13.0)).sortBy(_._1)
    got.zip(want).foreach { case (r, (y, c, a)) =>
      assert(math.abs(r.getDouble(1) - math.sqrt(math.log(c) + 1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - a * a * c) < 1e-12)
    }
  }

  test("categorical contrasts survive the rewritten formula") {
    val got = Formula.modelMatrix(frame, "y ~ log(c) + g")
      .orderBy("label").collect()
    // g levels a,b alphabetAsc; one-hot drops the last → one column
    // that is 1 for level 'a'
    val gOneHot = got.map(_.getDouble(2))
    assert(gOneHot.sameElements(Array(1.0, 0.0, 1.0, 0.0)))
  }
}
