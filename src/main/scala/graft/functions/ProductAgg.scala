package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** Exact product aggregate — reference streaming/colwise `prod`
  * (src/datastream.jl:87-247, src/operators.jl:52). Spark has no
  * product aggregate; exp∘Σlog loses exactness for zero/negative
  * inputs, so this is a typed `Aggregator` (SURVEY §7.3: "custom typed
  * Aggregator" escape hatch). Partial-aggregates map-side like any
  * DeclarativeAggregate buffer.
  */
object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `product(col)`. */
  def product(c: Column): Column = F.udaf(this).apply(c)
}
