package graft

import org.apache.spark.sql.{functions => F}
import graft.plans.{ZOrder, ZOrderKernels}

/** Z-order layout: kernel algebra + the locality claim itself —
  * range-partitioning by the Morton key must leave BOTH dimensions'
  * per-partition ranges narrow, where a linear sort leaves the trailing
  * dimension spanning its full range in every partition (so min/max
  * file skipping on it never fires at scale).
  */
class ZOrderSpec extends SparkSpec {

  test("interleave round-trips bits and orders quadrants") {
    // bit-exact spot checks
    assert(ZOrderKernels.interleave(0L, 0L) == 0L)
    assert(ZOrderKernels.interleave(1L, 0L) == 1L)
    assert(ZOrderKernels.interleave(0L, 1L) == 2L)
    assert(ZOrderKernels.interleave(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrderKernels.interleave(0L, 0xFFFFL) == 0xAAAAAAAAL)
    // quadrant order: z of any point in [0,2^15) × [0,2^15) sorts below
    // z of any point whose BOTH coords are >= 2^15
    val lo = ZOrderKernels.interleave(32767L, 32767L)
    val hi = ZOrderKernels.interleave(32768L, 32768L)
    assert(lo < hi)
  }

  test("codegen expression agrees with the kernel") {
    val rows = T.load(spark, sf, "lineitem")
      .select(F.col("l_partkey").cast("long").as("a"),
        F.col("l_suppkey").cast("long").as("b"))
      .withColumn("z", ZOrder.zvalue(F.col("a"), F.col("b")))
      .limit(500).collect()
    rows.foreach { r =>
      assert(r.getLong(2) ==
        ZOrderKernels.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z layout bounds BOTH dims per partition; linear sort does not") {
    val parts = 8
    val d = T.load(spark, sf, "lineitem")
      .select(F.col("l_partkey").cast("long").as("x"),
        F.col("l_suppkey").cast("long").as("y"))

    def avgSpan(df: org.apache.spark.sql.DataFrame, col: String): Double = {
      val spans = df
        .withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg((F.max(col) - F.min(col)).as("span"))
        .agg(F.avg("span")).collect()(0).getDouble(0)
      spans
    }

    val xMax = d.agg(F.max("x")).collect()(0).getLong(0).toDouble
    val yMax = d.agg(F.max("y")).collect()(0).getLong(0).toDouble

    // linear layout: sorted on x only
    val linear = d.repartitionByRange(parts, F.col("x"))
      .sortWithinPartitions("x")
    // z layout on (x, y)
    val zed = ZOrder.layoutByZ(d, F.col("x"), F.col("y"), parts)

    val linY = avgSpan(linear, "y")
    val zX = avgSpan(zed, "x")
    val zY = avgSpan(zed, "y")

    // the linear layout leaves y unclustered: each partition spans
    // ~the full y range
    assert(linY > 0.9 * yMax, s"linear y-span $linY vs max $yMax")
    // the z layout must bound BOTH dims strictly below the full range —
    // with 8 partitions a Morton layout halves at least one bit level
    // per dim (≤ ~55% of the range after boundary slack)
    assert(zX < 0.75 * xMax, s"z x-span $zX vs max $xMax")
    assert(zY < 0.75 * yMax, s"z y-span $zY vs max $yMax")
  }
}
