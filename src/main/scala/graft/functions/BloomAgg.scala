package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Bloom-filter build: aggregates pre-computed bit
  * POSITIONS into a fixed-width bit array (`array<bigint>` of
  * `numWords` 64-bit words).
  *
  * All hashing happens in the PLAN (xxhash64 column expressions — see
  * [[graft.text.Bloom.positionsOfHashExpr]]), never in JVM-side code, so the
  * build and the probe share one hash definition by construction. The
  * aggregator itself only ORs bits: partial aggregation sets bits
  * map-side and the shuffle carries ONE array per task — the property
  * that makes a 100 TB build cost exactly one scan.
  *
  * Spark's internal `BloomFilterAggregate` is not SQL-registered (it
  * backs runtime row-group filtering), so this typed Aggregator is the
  * public-API equivalent (SURVEY §7.3 escape hatch, same pattern as
  * [[ProductAgg]]/[[TopKAgg]]).
  */
class BloomBitsAgg(numWords: Int)
    extends Aggregator[Int, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](numWords)
  override def reduce(b: Array[Long], pos: Int): Array[Long] = {
    b(pos >>> 6) |= (1L << (pos & 63)); b
  }
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b1(i) |= b2(i); i += 1 }
    b1
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomBitsAgg {
  /** Column form: OR the bit positions in `posCol` into one
    * `numBits`-wide bloom array. */
  def bloomBits(posCol: Column, numBits: Int): Column = {
    require(numBits % 64 == 0, s"numBits $numBits must be a multiple of 64")
    F.udaf(new BloomBitsAgg(numBits / 64), ExpressionEncoder[Int]())
      .apply(posCol)
  }
}
