package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-width counter-array aggregate: each input is an index to bump
  * by one; merge is element-wise addition. The distributed primitive
  * under Count-Min sketches ([[graft.sketch.CountMin]]) — like
  * [[BloomBitsAgg]], index computation happens in the PLAN (xxhash64
  * expressions shared with the probe side), the aggregator only
  * counts. Partial aggregation counts map-side and ships one array per
  * task, so sketching 100 TB costs one scan.
  */
class CounterArrayAgg(size: Int)
    extends Aggregator[Int, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](size)
  override def reduce(b: Array[Long], idx: Int): Array[Long] = {
    b(idx) += 1L; b
  }
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CounterArrayAgg {
  /** Column form: count occurrences of each index in `idxCol` into a
    * `size`-wide array. */
  def counters(idxCol: Column, size: Int): Column =
    F.udaf(new CounterArrayAgg(size), ExpressionEncoder[Int]())
      .apply(idxCol)
}
