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
    // nested parens in an operand and signed exponents — the cases a
    // flat regex could not parse (a residual ^ reaches Catalyst as
    // bitwise XOR)
    assert(Formula.caretsToPower("(log(c) + 1)^2") ==
      "power((log(c) + 1),2)")
    assert(Formula.caretsToPower("x^-1") == "power(x,-1)")
    assert(Formula.caretsToPower("log(c)^2") == "power(log(c),2)")
    assert(Formula.caretsToPower("2^(a^2)") == "power(2,(power(a,2)))")
    // whitespace between a function name and its parens (round-10
    // ADVICE): SQL allows `log (c)`, so the name must ride with the
    // operand instead of being dropped (left) or orphaned (right)
    assert(Formula.caretsToPower("log (c)^2") == "power(log (c),2)")
    assert(Formula.caretsToPower("x^log (c)") == "power(x,log (c))")
    // ...but ws after a NON-call group must not swallow the operator
    assert(Formula.caretsToPower("a * (b)^2") == "a * power((b),2)")
    assert(Formula.caretsToPower("x ^ 2") == "power(x,2)")
  }

  test("I() with nested parens evaluates; NaN transforms drop rows") {
    import spark.implicits._
    val got = Formula.modelMatrix(frame, "y ~ I((log(c) + 1)^2)")
      .orderBy("label").collect()
    val want = Seq((1.0, 2.0), (4.0, 5.0), (9.0, 8.0), (16.0, 11.0))
    got.zip(want).foreach { case (r, (y, c)) =>
      val e = math.pow(math.log(c) + 1, 2)
      assert(math.abs(r.getDouble(1) - e) < 1e-12, s"$y: ${r.getDouble(1)} != $e")
    }
    // sqrt of a negative is NaN in Spark (not null); model.frame
    // complete-cases must drop that row, not emit NaN features
    val df = Seq((1.0, 4.0), (2.0, -9.0), (3.0, 16.0)).toDF("y", "a")
    val rows = Formula.modelMatrix(df, "y ~ sqrt(a)")
      .orderBy("label").collect()
    assert(rows.length == 2, s"NaN row not dropped: ${rows.mkString(";")}")
    assert(rows.map(_.getDouble(1)).sameElements(Array(2.0, 4.0)))
  }

  test("cross operator * with a function factor expands R-style") {
    // log(c)*g ≡ log(c) + g + log(c):g after materialization; with g
    // categorical (levels a,b) the design matrix is [log(c), g_a,
    // log(c)·g_a] — proving the rewritten factor drives RFormula's
    // own term algebra, not just simple sums
    val got = Formula.modelMatrix(frame, "y ~ log(c)*g")
      .orderBy("label").collect()
    val want = Seq((1.0, 2.0, "a"), (4.0, 5.0, "b"),
      (9.0, 8.0, "a"), (16.0, 11.0, "b")).sortBy(_._1)
    got.zip(want).foreach { case (r, (y, c, g)) =>
      val ga = if (g == "a") 1.0 else 0.0
      assert(math.abs(r.getDouble(1) - math.log(c)) < 1e-12)
      assert(r.getDouble(2) == ga)
      assert(math.abs(r.getDouble(3) - math.log(c) * ga) < 1e-12,
        s"$y: interaction ${r.getDouble(3)} != ${math.log(c) * ga}")
    }
  }

  test("multi-way cross a*b*c expands to all 7 terms") {
    import spark.implicits._
    // reference expands arbitrary-depth crosses (src/formula.jl:67-125,
    // dospecials): a*b*c ≡ a + b + c + a:b + a:c + b:c + a:b:c — with
    // numeric factors the design matrix is exactly those 7 columns
    val df = Seq((1.0, 2.0, 3.0, 5.0), (2.0, 3.0, 5.0, 7.0),
      (3.0, 5.0, 7.0, 11.0), (4.0, 7.0, 11.0, 13.0))
      .toDF("y", "a", "b", "c")
    val got = Formula.modelMatrix(df, "y ~ a*b*c")
      .orderBy("label").collect()
    assert(got.head.length == 8, // label + 7 terms
      s"expected 7 cross terms, got ${got.head.length - 1}")
    val want = Seq((1.0, 2.0, 3.0, 5.0), (2.0, 3.0, 5.0, 7.0),
      (3.0, 5.0, 7.0, 11.0), (4.0, 7.0, 11.0, 13.0))
    got.zip(want).foreach { case (r, (y, a, b, c)) =>
      assert(r.getDouble(0) == y)
      val terms = (1 to 7).map(r.getDouble).toSet
      val wantTerms = Set(a, b, c, a * b, a * c, b * c, a * b * c)
      assert(terms == wantTerms, s"y=$y: $terms != $wantTerms")
    }
  }

  test("I(a*b) is arithmetic (one term), not a cross") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0), (2.0, 3.0, 5.0), (3.0, 5.0, 7.0))
      .toDF("y", "a", "b")
    val got = Formula.modelMatrix(df, "y ~ I(a*b)")
      .orderBy("label").collect()
    assert(got.head.length == 2, // label + the single product column
      s"I(a*b) must be ONE term, got ${got.head.length - 1}")
    got.foreach { r =>
      val (y, f0) = (r.getDouble(0), r.getDouble(1))
      val (a, b) = Seq((1.0, 2.0, 3.0), (2.0, 3.0, 5.0), (3.0, 5.0, 7.0))
        .find(_._1 == y).map(t => (t._2, t._3)).get
      assert(f0 == a * b, s"y=$y: $f0 != ${a * b}")
    }
    // and the cross of an I() factor still works: I(a*b)*b ≡
    // I(a*b) + b + I(a*b):b (3 terms)
    val crossed = Formula.modelMatrix(df, "y ~ I(a*b)*b")
      .orderBy("label").collect()
    assert(crossed.head.length == 4,
      s"I(a*b)*b must be 3 terms, got ${crossed.head.length - 1}")
  }

  test("dot expansion and mixed paths agree: numeric fast path vs " +
      "RFormula route") {
    import spark.implicits._
    // y ~ . on an all-numeric frame rides the round-11 fast path;
    // forcing the same formula through RFormula (by adding-then-
    // dropping nothing numeric changes) must give identical values —
    // here checked against hand arithmetic for both shapes
    val df = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0), (9.0, 8.0, 7.0))
      .toDF("y", "a", "b")
    val dot = Formula.modelMatrix(df, "y ~ .").orderBy("label").collect()
    assert(dot.head.length == 3) // label + a + b
    dot.zip(Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0), (9.0, 8.0, 7.0)))
      .foreach { case (r, (y, a, b)) =>
        assert(r.getDouble(0) == y && r.getDouble(1) == a
          && r.getDouble(2) == b)
      }
    // term-algebra simplification holds on the fast path too:
    // a:a dedups to a (R semantics), so y ~ a + a:a is ONE feature
    val dedup = Formula.modelMatrix(df, "y ~ a + a:a")
      .orderBy("label").collect()
    assert(dedup.head.length == 2, "a:a must simplify into a")
    // a mixed numeric + categorical frame rides the round-12 contrast
    // fast path (when(col === level) indicators) — values unchanged
    val mixed = Seq((1.0, 2.0, "x"), (4.0, 5.0, "y"), (9.0, 8.0, "x"))
      .toDF("y", "a", "g")
    val viaFast = Formula.modelMatrix(mixed, "y ~ a + g")
      .orderBy("label").collect()
    viaFast.zip(Seq((1.0, 2.0, 1.0), (4.0, 5.0, 0.0), (9.0, 8.0, 1.0)))
      .foreach { case (r, (y, a, gx)) =>
        assert(r.getDouble(0) == y && r.getDouble(1) == a
          && r.getDouble(2) == gx)
      }
  }

  test("categorical fast path == RFormula route, column for column") {
    import spark.implicits._
    // round-12 verdict task 3: the contrast fast path must reproduce
    // RFormula's StringIndexer(alphabetAsc) + OneHotEncoder(dropLast)
    // output EXACTLY — same column count, same order, same values —
    // across: a 3-level factor, two factors, a factor alongside
    // numeric terms and a function term, and a numeric interaction
    val df = Seq(
      (1.0, 2.0, 3.0, "b", "v"), (4.0, 5.0, 6.0, "a", "w"),
      (9.0, 8.0, 7.0, "c", "v"), (16.0, 11.0, 13.0, "a", "u"),
      (25.0, 3.0, 2.0, "b", "u"), (36.0, 7.0, 9.0, "c", "w"))
      .toDF("y", "c", "a", "g", "h")
    for (f <- Seq("y ~ g", "y ~ a + g", "y ~ g + h",
        "y ~ log(c) + g + a:c", "y ~ c + g + h + I(a^2)")) {
      val fast = Formula.modelMatrix(df, f)
      val ml = Formula.modelMatrixVia(df, f, forceMl = true)
      assert(fast.columns.sameElements(ml.columns), s"$f columns")
      val a1 = fast.orderBy("label").collect()
      val a2 = ml.orderBy("label").collect()
      a1.zip(a2).foreach { case (r1, r2) =>
        assert(r1 == r2, s"$f: $r1 != $r2")
      }
      // and the fast plan carries no ML vector UDFs
      assert(!fast.queryExecution.executedPlan.toString.contains("UDF"),
        s"$f did not take the expression path")
    }
    // fall-through shape stays on the ML route and stays correct:
    // a no-intercept formula (contrast coding changes)
    for (f <- Seq("y ~ g - 1")) {
      val out = Formula.modelMatrix(df, f)
      val ml = Formula.modelMatrixVia(df, f, forceMl = true)
      assert(out.columns.sameElements(ml.columns), s"$f columns")
      out.orderBy("label").collect()
        .zip(ml.orderBy("label").collect())
        .foreach { case (r1, r2) => assert(r1 == r2, s"$f: $r1 != $r2") }
    }
  }

  test("categorical INTERACTION fast path == RFormula, column for column") {
    import spark.implicits._
    // round-12 verdict task 4: factor:numeric and factor:factor terms
    // must reproduce ml.Interaction's full-dummy outer product (first
    // factor outermost, ALL k levels inside an interaction — only
    // standalone terms drop the reference level) as plain when()
    // indicator products — same columns, same order, same values.
    val df = Seq(
      (1.0, 2.0, 3.0, "b", "v"), (4.0, 5.0, 6.0, "a", "w"),
      (9.0, 8.0, 7.0, "c", "v"), (16.0, 11.0, 13.0, "a", "u"),
      (25.0, 3.0, 2.0, "b", "u"), (36.0, 7.0, 9.0, "c", "w"),
      (49.0, 1.0, 4.0, "b", "w"))
      .toDF("y", "c", "a", "g", "h")
    for (f <- Seq("y ~ a*g", "y ~ g:h", "y ~ a + g:c",
        "y ~ g*h", "y ~ a:g:h", "y ~ g + g:h + c",
        "y ~ log(c) + a:g")) {
      val fast = Formula.modelMatrix(df, f)
      val ml = Formula.modelMatrixVia(df, f, forceMl = true)
      assert(fast.columns.sameElements(ml.columns), s"$f columns")
      fast.orderBy("label").collect()
        .zip(ml.orderBy("label").collect())
        .foreach { case (r1, r2) => assert(r1 == r2, s"$f: $r1 != $r2") }
      // the interaction shapes ride the expression path: no ML UDFs
      assert(!fast.queryExecution.executedPlan.toString.contains("UDF"),
        s"$f did not take the expression path")
    }
    // hand-check one shape: y ~ g:h on 3×3 levels = 9 indicator
    // columns ordered g-outer/h-inner; each row lights exactly one
    val gh = Formula.modelMatrix(df, "y ~ g:h").orderBy("label")
      .collect()
    assert(gh.head.length == 1 + 9)
    gh.foreach { r =>
      val ones = (1 to 9).map(r.getDouble).count(_ == 1.0)
      val zeros = (1 to 9).map(r.getDouble).count(_ == 0.0)
      assert(ones == 1 && zeros == 8, s"not a one-hot product: $r")
    }
    // row y=1 has g=b (index 1 of a,b,c), h=v (index 1 of u,v,w):
    // lit column = 1*3 + 1 = index 4 → f4
    assert(gh.head.getDouble(0) == 1.0 && gh.head.getDouble(5) == 1.0)
  }

  test("materialized term names skip existing columns") {
    import spark.implicits._
    // a frame already carrying graftTerm0 must not have it overwritten
    val df = Seq((1.0, 2.0, 7.0), (4.0, 5.0, 8.0), (9.0, 8.0, 9.0))
      .toDF("y", "c", "graftTerm0")
    val got = Formula.modelMatrix(df, "y ~ log(c) + graftTerm0")
      .orderBy("label").collect()
    got.zip(Seq((1.0, 2.0, 7.0), (4.0, 5.0, 8.0), (9.0, 8.0, 9.0)))
      .foreach { case (r, (y, c, g)) =>
        assert(math.abs(r.getDouble(1) - math.log(c)) < 1e-12)
        assert(r.getDouble(2) == g,
          s"pre-existing graftTerm0 was clobbered: ${r.getDouble(2)}")
      }
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

  test("term width near MaxContrastLevels gates fast path vs fallback") {
    import spark.implicits._
    // r13 verdict task 5: the when()-chain width of an interaction
    // term scales as (levels of factor1) × (levels of factor2); past
    // MaxContrastLevels the ML fallback must engage rather than
    // compiling a pathological codegen span. Probe BOTH sides of the
    // boundary on the same frame: 128×2 = 256 rides the expression
    // path, 130×2 = 260 falls back — and the fallback output is still
    // the correct full-dummy design matrix.
    val wide = (0 until 130).flatMap { i =>
      Seq((i * 2 + 0.0, f"L$i%03d", "u"), (i * 2 + 1.0, f"L$i%03d", "v"))
    }.toDF("y", "w", "h")
    val okW = wide.filter(F.col("w") < "L128") // 128 levels × 2 = 256
    val fast = Formula.modelMatrix(okW, "y ~ w:h")
    assert(Formula.lastPathWasFast, "256-wide term left the fast path")
    assert(fast.columns.length == 1 + 256)
    assert(!fast.queryExecution.executedPlan.toString.contains("UDF"))
    val fell = Formula.modelMatrix(wide, "y ~ w:h") // 130 × 2 = 260
    assert(!Formula.lastPathWasFast, "260-wide term took the fast path")
    assert(fell.columns.length == 1 + 260)
    // fallback output is the same design matrix the ML route builds
    val ml = Formula.modelMatrixVia(wide, "y ~ w:h", forceMl = true)
    fell.orderBy("label").collect()
      .zip(ml.orderBy("label").collect())
      .foreach { case (r1, r2) => assert(r1 == r2, s"$r1 != $r2") }
    // a 130-level STANDALONE factor stays fast (129 contrast columns
    // ≤ MaxContrastLevels — only the term-width product tripped)
    Formula.modelMatrix(wide, "y ~ w")
    assert(Formula.lastPathWasFast, "130-level standalone fell back")
  }
}
