package org.apache.spark.ml.feature

import org.apache.spark.sql.types.StructType

/** Access to Spark ML's R-formula term algebra (`RFormulaParser` is
  * private[ml]) — same extension-library bridge pattern as
  * [[org.apache.spark.sql.GraftReleaseBridge]]. The graft Formula
  * layer uses the RESOLVED term list to emit numeric-only design
  * matrices as plain codegen'd column products instead of routing
  * through VectorAssembler/Interaction UDFs (measured 10× slower for
  * the pure-numeric case); the parser stays the single source of
  * truth for `~ + - : * .` semantics, so both paths expand formulas
  * identically.
  */
object GraftFormulaBridge {

  /** (label column, resolved terms — each a list of factor columns,
    * interaction = product; same order RFormula assembles). */
  def resolvedTerms(formula: String,
                    schema: StructType): (String, Seq[Seq[String]]) = {
    val resolved = RFormulaParser.parse(formula).resolve(schema)
    (resolved.label, resolved.terms)
  }

  /** [[resolvedTerms]] plus the parsed intercept flag — the
    * categorical fast path needs it because RFormula's one-hot
    * contrast (dropLast) only holds under an intercept; `~ x - 1`
    * formulas keep the ML route. */
  def resolvedTermsWithIntercept(formula: String, schema: StructType)
      : (String, Seq[Seq[String]], Boolean) = {
    val parsed = RFormulaParser.parse(formula)
    val resolved = parsed.resolve(schema)
    (resolved.label, resolved.terms, parsed.hasIntercept)
  }
}
