package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: for every registered query, count the plan
  * features that matter at 100 TB — shuffles (Exchange), join
  * strategies, whole-stage codegen coverage, parquet filter pushdown
  * and column pruning. Run after bench; eyeball the RED flags.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryPrefix...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = Session.local(8, 8)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .map { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // execute THIS QueryExecution so AQE finalizes (a write/count
          // would spawn a separate one); audit runs at small sf.
          df.collect()
          val plan = df.queryExecution.executedPlan.toString()
          val shuffles = "Exchange hashpartitioning".r
            .findAllIn(plan).size
          // A SinglePartition exchange is the scale red flag ONLY when
          // it funnels data rows through one task. The final step of a
          // global scalar aggregate (child = HashAggregate(keys=[]))
          // moves one partial-agg row per map task — O(partitions),
          // benign by construction — and is counted apart as `scalar`.
          val planLines = plan.linesIterator.toArray
          val singleIdx = planLines.zipWithIndex.collect {
            case (l, i) if l.contains("Exchange SinglePartition") => i
          }
          val scalarAgg = singleIdx.count(i =>
            planLines.slice(i + 1, i + 4)
              .exists(_.contains("HashAggregate(keys=[]")))
          val singleParts = singleIdx.length - scalarAgg
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
          val smj = "SortMergeJoin".r.findAllIn(plan).size
          val shj = "ShuffledHashJoin".r.findAllIn(plan).size
          // codegen'd operators print as "*(id) Op"; count distinct spans
          val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
          val widecols = "ReadSchema: [^\\n]{220,}".r.findAllIn(plan).size
          f"$name%-22s shuf=$shuffles%2d single=$singleParts%2d " +
            f"scalar=$scalarAgg%2d bhj=$bhj%2d smj=$smj%2d shj=$shj%2d " +
            f"wscg=$codegen%2d pushed=$pushed%2d wide_scan=$widecols%2d"
        } catch {
          case e: Throwable => f"$name%-22s PLAN-ERROR ${e.getMessage.take(60)}"
        }
      }
    rows.foreach(println)
    spark.stop()
  }
}
