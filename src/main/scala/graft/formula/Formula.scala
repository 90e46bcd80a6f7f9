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

  /** Fit + transform: returns the frame with `label` and the design
    * matrix exploded to plain double columns `f0..f{k-1}` (ModelMatrix
    * parity — reference emits a dense Matrix{Float64},
    * src/formula.jl:219-237).
    */
  def modelMatrix(df: DataFrame, formula: String): DataFrame = {
    val clean = df.na.drop("any")
    val rf = new RFormula()
      .setFormula(formula)
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
    val cols = (0 until width).map(i =>
      F.element_at(vector_to_array(F.col("__features")), i + 1).as(s"f$i"))
    out.select(F.col("label") +: cols: _*)
  }
}
