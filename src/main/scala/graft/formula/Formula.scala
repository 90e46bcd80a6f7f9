package graft.formula

import org.apache.spark.ml.feature.RFormula
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, functions => F}

/** Model-formula layer — reference `Formula`/`ModelFrame`/`ModelMatrix`
  * (src/formula.jl:14-37, 219-237): R-style `y ~ a + b + a:b` expanded
  * to a numeric design matrix with treatment contrasts
  * (contr_treatment, src/formula.jl:185-196).
  *
  * Spark ML's RFormula covers the term DSL (`+ - : . *`); categorical
  * columns are one-hot encoded. `stringOrderType=alphabetAsc` pins the
  * level order so the encoding is deterministic (the reference's
  * contrast matrix is level-ordered too). NA rows are dropped first
  * (model.frame semantics, src/formula.jl:152-155).
  */
object Formula {

  /** Split `s` at top-level occurrences of `seps` (parenthesis-aware),
    * KEEPING the separators as their own tokens, so the rewritten
    * formula reassembles with its original operators. */
  private[graft] def splitKeep(s: String, seps: Set[Char]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach { c =>
      if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (depth == 0 && seps(c)) {
        out += cur.toString; out += c.toString; cur.clear()
      } else cur += c
    }
    out += cur.toString
    out.result()
  }

  /** R's `^` is exponentiation; Spark SQL's is bitwise xor. Rewrite
    * every `a ^ b` to `power(a, b)` with a balanced-paren scanner —
    * operands may be identifiers, numbers, function calls with NESTED
    * parens (`(log(c)+1)^2`), parenthesized expressions, or a signed
    * exponent (`x^-1`); a residual `^` reaching Catalyst would be
    * bitwise XOR (an AnalysisException on doubles, silent corruption
    * on ints). Chained carets without parens associate LEFT
    * (parenthesize `a^(b^c)` if the distinction ever matters in a
    * formula, which in practice it does not). */
  private[graft] def caretsToPower(s: String): String = {
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
    // index where the left operand starts, given its exclusive end
    def leftStart(str: String, end: Int): Int = {
      var j = end - 1
      if (j >= 0 && str(j) == ')') {
        var depth = 0
        while (j >= 0) {
          if (str(j) == ')') depth += 1
          else if (str(j) == '(') {
            depth -= 1
            if (depth == 0) {
              j -= 1 // include a function name before '(' — SQL allows
              // whitespace between name and parens (`log (c)^2`), so
              // skip it, but only when an identifier actually precedes
              // (otherwise the ws belongs between operators, keep it)
              var w = j
              while (w >= 0 && str(w).isWhitespace) w -= 1
              if (w >= 0 && isIdent(str(w))) {
                j = w
                while (j >= 0 && isIdent(str(j))) j -= 1
              }
              return j + 1
            }
          }
          j -= 1
        }
        0
      } else {
        while (j >= 0 && isIdent(str(j))) j -= 1
        j + 1
      }
    }
    // exclusive index where the right operand ends, given its start
    def rightEnd(str: String, start: Int): Int = {
      var j = start
      if (j < str.length && (str(j) == '+' || str(j) == '-')) j += 1
      val idStart = j
      while (j < str.length && isIdent(str(j))) j += 1
      // a call's argument list may sit past whitespace (`x^log (c)`):
      // peek across it, but only bind the parens to an identifier we
      // actually scanned (a bare `( ... )` group binds regardless)
      if (j > idStart) {
        var w = j
        while (w < str.length && str(w).isWhitespace) w += 1
        if (w < str.length && str(w) == '(') j = w
      }
      if (j < str.length && str(j) == '(') {
        var depth = 0
        while (j < str.length) {
          if (str(j) == '(') depth += 1
          else if (str(j) == ')') { depth -= 1; if (depth == 0) return j + 1 }
          j += 1
        }
        str.length
      } else if (j > idStart) j
      else start
    }
    var cur = s
    var i = cur.indexOf('^')
    while (i >= 0) {
      var le = i
      while (le > 0 && cur(le - 1).isWhitespace) le -= 1
      val ls = leftStart(cur, le)
      var rs = i + 1
      while (rs < cur.length && cur(rs).isWhitespace) rs += 1
      val re = rightEnd(cur, rs)
      require(ls < le && rs < re, s"cannot parse ^ operands in: $cur")
      cur = cur.substring(0, ls) + "power(" + cur.substring(ls, le) +
        "," + cur.substring(rs, re) + ")" + cur.substring(re)
      i = cur.indexOf('^')
    }
    cur
  }

  private val BareTerm = "[A-Za-z_][A-Za-z0-9_.]*|\\.|[0-9]+(?:\\.[0-9]+)?"

  /** FUNCTION TERMS (reference expands arbitrary call expressions in
    * terms, src/formula.jl:67-125): `y ~ log(c) + I(a^2) + b`
    * evaluates `log(c)` and `a^2` as columns before the term DSL sees
    * them. Spark's RFormula accepts only column names in terms, so
    * this pre-pass materializes every non-bare factor as a computed
    * column (`withColumn` over a Catalyst expr — arbitrary nesting
    * free) and rewrites the formula to reference it:
    *   - `I(expr)` protects arithmetic from the term DSL (R
    *     semantics); the inside is a SQL expression with `^`
    *     translated to `power()`;
    *   - any other call factor (`log(c)`, `sqrt(log(c) + 1)`, …)
    *     evaluates as-is;
    *   - bare names, `.` and interactions/crosses of bare names pass
    *     through untouched (so existing formulas like q62's are
    *     byte-identical after the pass); function factors INSIDE
    *     `:`/`*` are materialized per factor.
    * Returns the augmented frame and the rewritten formula. */
  private[graft] def expandFunctionTerms(df: DataFrame,
      formula: String): (DataFrame, String) = {
    var cur = df
    var n = 0
    def factor(f: String): String = {
      val t = f.trim
      if (t.isEmpty || t.matches(BareTerm)) f
      else {
        val inner = "^I\\((.*)\\)$".r.findFirstMatchIn(t)
          .map(_.group(1)).getOrElse(t)
        // letter-led name (RFormula's term grammar rejects a leading
        // underscore), skipping any name the frame already has — a
        // collision would silently overwrite the existing column
        var name = s"graftTerm$n"; n += 1
        while (cur.columns.contains(name)) { name = s"graftTerm$n"; n += 1 }
        // nanvl: R's model.frame treats NaN as NA, but na.drop only
        // drops nulls — map transform-produced NaN (sqrt of a
        // negative, asin out of range) to null so complete-cases
        // semantics hold for NaN-producing transforms too
        cur = cur.withColumn(name,
          F.nanvl(F.expr(caretsToPower(inner)).cast("double"),
            F.lit(null).cast("double")))
        name
      }
    }
    def side(s: String): String =
      splitKeep(s, Set('+', '-')).map { tok =>
        if (tok == "+" || tok == "-") tok
        else splitKeep(tok, Set(':', '*')).map { ftok =>
          if (ftok == ":" || ftok == "*") ftok else factor(ftok)
        }.mkString
      }.mkString
    val parts = formula.split("~", 2)
    require(parts.length == 2, s"formula needs ~: $formula")
    // build the string FIRST: side() mutates `cur`, and a tuple
    // literal would capture the pre-mutation frame
    val rewritten = side(parts(0)) + "~" + side(parts(1))
    (cur, rewritten)
  }

  /** Fit + transform: returns the frame with `label` and the design
    * matrix exploded to plain double columns `f0..f{k-1}` (ModelMatrix
    * parity — reference emits a dense Matrix{Float64},
    * src/formula.jl:219-237). Function terms and `I()` arithmetic are
    * expanded first (see [[expandFunctionTerms]]); NA rows — including
    * rows a transform maps to null (log of a non-positive) or to NaN
    * (sqrt of a negative; NaN is normalized to null at
    * materialization) — drop AFTER expansion, matching the
    * reference's model.frame complete-cases semantics over evaluated
    * terms.
    */
  def modelMatrix(df: DataFrame, formula: String): DataFrame =
    modelMatrixVia(df, formula, forceMl = false)

  /** Bound on categorical cardinality for the contrast fast path: the
    * level set is ONE bounded driver collect (RFormula's own
    * StringIndexer fit collects the same set), and past this width an
    * exploded f0..fk design matrix stops being a sane frame anyway —
    * wider factors keep the ML route. */
  val MaxContrastLevels = 256

  /** Test-only observability of the route taken by this thread's LAST
    * modelMatrix call (FormulaSpec's width-gate case asserts the
    * fallback engages at term width > [[MaxContrastLevels]] instead
    * of compiling a pathological when()-chain). Not part of the API.
    * Thread-local (round-14 advice): a shared @volatile would
    * cross-talk under concurrent modelMatrix callers; per-thread
    * state keeps the observability and removes the race. */
  private val lastPathWasFastTl = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
  private[graft] def lastPathWasFast: Boolean = lastPathWasFastTl.get()

  /** `forceMl = true` pins the RFormula/VectorAssembler route —
    * FormulaSpec uses it to assert fast path == ML path
    * column-for-column. */
  private[graft] def modelMatrixVia(df: DataFrame, formula: String,
      forceMl: Boolean): DataFrame = {
    val (df2, formula2) = expandFunctionTerms(df, formula)
    val clean = df2.na.drop("any")
    // Expression fast path (rounds 11-13): when the label is numeric
    // and every factor of every resolved term is numeric or string,
    // the design matrix is plain codegen'd expressions:
    //   - a STANDALONE categorical term = treatment contrast —
    //     `when(col === level, 1.0)` indicators over the fitted
    //     alphabetical level order, dropping the last level (exactly
    //     RFormula's StringIndexer(alphabetAsc) + OneHotEncoder
    //     (dropLast) under an intercept);
    //   - an INTERACTION term = the outer product of its factor
    //     encodings, first factor outermost, where a categorical
    //     factor encodes FULL-dummy (all k levels — RFormula routes
    //     interactions through ml.Interaction, which one-hots nominal
    //     inputs without dropping a reference level; the reference's
    //     expandcols does the same level-indicator product,
    //     src/formula.jl:205-215) and a numeric factor is itself;
    //   - an all-numeric term = the codegen'd column product.
    // The VectorAssembler/Interaction route costs ~10× (per-row ML
    // vector UDFs; measured 1.8 s vs 0.2 s at 600k×8 numeric, and
    // q62's categorical shape 3× — see FormulaSpec's
    // column-for-column equality pins). The parser
    // (GraftFormulaBridge → RFormulaParser) stays the single source
    // of term-algebra truth. Falls through to RFormula for: a
    // no-intercept formula (contrast coding changes), a
    // non-numeric/non-string factor, a factor wider than
    // [[MaxContrastLevels]], or a term whose indicator outer product
    // exceeds that same width (a when()-chain that wide stops being
    // codegen-friendly; the exploded f0..fk frame stops being sane).
    val fast = if (forceMl) None else scala.util.Try {
      val (label, terms, hasIntercept) = org.apache.spark.ml.feature
        .GraftFormulaBridge.resolvedTermsWithIntercept(
          formula2, clean.schema)
      val fieldType = clean.schema.fields
        .map(f => f.name -> f.dataType).toMap
      def isNum(c: String) = fieldType.get(c)
        .exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
      def isStr(c: String) = fieldType.get(c)
        .contains(org.apache.spark.sql.types.StringType)
      val ok = isNum(label) && hasIntercept &&
        terms.forall(_.forall(c => isNum(c) || isStr(c)))
      if (!ok) None
      else {
        val catCols = terms.flatten.filter(isStr).distinct
        val levels: Map[String, Seq[String]] = catCols.map { c =>
          c -> clean.select(c).distinct()
            .limit(MaxContrastLevels + 1)
            .collect().map(_.getString(0)).toSeq.sorted
        }.toMap
        def termWidth(fs: Seq[String]): Long =
          fs.map(c => if (isStr(c)) levels(c).size.toLong else 1L)
            .product
        if (levels.values.exists(_.size > MaxContrastLevels) ||
            terms.exists(termWidth(_) > MaxContrastLevels)) None
        else {
          // full-dummy factor encoding for interaction terms
          def enc(c: String): Seq[org.apache.spark.sql.Column] =
            if (isStr(c)) levels(c).map(l =>
              F.when(F.col(c) === l, 1.0).otherwise(0.0))
            else Seq(F.col(c).cast("double"))
          val fCols = terms.flatMap { fs =>
            if (fs.size == 1 && isStr(fs.head))
              levels(fs.head).dropRight(1).map(l =>
                F.when(F.col(fs.head) === l, 1.0).otherwise(0.0))
            else
              // outer product, first factor outermost — for an
              // all-numeric term this folds to the same left-assoc
              // column product as before
              fs.map(enc).reduce((acc, nxt) =>
                for (a <- acc; b <- nxt) yield a * b)
          }.zipWithIndex.map { case (c, i) => c.as(s"f$i") }
          Some(clean.select(
            F.col(label).cast("double").as("label") +: fCols: _*))
        }
      }
    }.toOption.flatten
    lastPathWasFastTl.set(fast.isDefined)
    if (fast.isDefined) return fast.get
    val rf = new RFormula()
      .setFormula(formula2)
      .setFeaturesCol("__features")
      .setLabelCol("label")
      .setStringIndexerOrderType("alphabetAsc")
    val fitted = rf.fit(clean)
    val out = fitted.transform(clean)
    // Design-matrix width comes from the ML attribute metadata RFormula
    // stamps on the features column — free, no job. (A .first() here
    // cost a full extra pass over the data in round 1.) The metadata is
    // always present for RFormula output; the scan fallback is only
    // defensive for exotic inputs.
    val meta = org.apache.spark.ml.attribute.AttributeGroup
      .fromStructField(out.schema("__features"))
    val width =
      if (meta.size >= 0) meta.size
      else out.select(F.size(vector_to_array(F.col("__features"))))
        .first().getInt(0)
    // ONE vector→array conversion per row (vector_to_array is a UDF,
    // so Catalyst does not CSE repeated calls — the old per-column
    // form paid width× conversions per row, ~1.5 s at 600k×9)
    val cols = (0 until width).map(i =>
      F.element_at(F.col("__arr"), i + 1).as(s"f$i"))
    out.withColumn("__arr", vector_to_array(F.col("__features")))
      .select(F.col("label") +: cols: _*)
  }
}
