package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT quantiles by range-partitioned sort + rank
  * selection — the scalable exact algorithm (the reference's
  * distributed quantile does iterative pivot guessing over blocks,
  * src/dataframe_blocks.jl:263-356; a parallel sort subsumes it).
  *
  * `percentile()` builds a per-partition value map whose merge cost is
  * O(distinct values) on a single reducer — fine for low-cardinality
  * columns, quadratic-feeling for 100 TB of doubles. Here: sortBy
  * (range partitioner → parallel), per-partition counts (one cheap
  * job), then one targeted pass that emits only the rank-straddling
  * elements. Interpolation matches `percentile`/`quantile_cont`
  * (linear between floor/ceil ranks).
  */
object Quantiles {

  /** Exact interpolated quantiles of a numeric column. Returns the
    * values in `qs` order. Runs 2 light jobs + 1 sort. */
  def exact(df: DataFrame, col: String, qs: Seq[Double]): Seq[Double] = {
    val rdd0 = df.select(F.col(col).cast("double")).na.drop()
      .rdd.map(_.getDouble(0))
    val sorted = rdd0.sortBy(identity)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = sorted.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.size.toLong))
      }.collect().sortBy(_._1).map(_._2)
      val n = counts.sum
      require(n > 0, s"no non-null values in $col")
      val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before part i
      // global ranks we need (floor & ceil per quantile, 0-based)
      val targets = qs.flatMap { q =>
        val pos = q * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct.sorted
      val byPart = targets.groupBy { r =>
        val p = offsets.lastIndexWhere(_ <= r)
        math.min(p, counts.length - 1)
      }
      val bc = sorted.sparkContext.broadcast(byPart.map { case (p, rs) =>
        p -> rs.map(r => r - offsets(p))
      })
      val picked = sorted.mapPartitionsWithIndex { (i, it) =>
        bc.value.get(i) match {
          case None => Iterator.empty
          case Some(localRanks) =>
            val wanted = localRanks.toSet
            val offset = 0L
            it.zipWithIndex.collect {
              case (v, j) if wanted.contains(j.toLong) =>
                (localRanks.indexOf(j.toLong), i, j.toLong, v)
            }
        }
      }.collect()
      val valueAt: Map[(Int, Long), Double] =
        picked.map { case (_, p, lr, v) => (p, lr) -> v }.toMap
      def globalValue(r: Long): Double = {
        val p = math.min(offsets.lastIndexWhere(_ <= r), counts.length - 1)
        valueAt((p, r - offsets(p)))
      }
      qs.map { q =>
        val pos = q * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vl = globalValue(lo)
        val vh = globalValue(hi)
        if (lo == hi) vl else vl + (pos - lo) * (vh - vl)
      }
    } finally sorted.unpersist(blocking = false)
  }
}
