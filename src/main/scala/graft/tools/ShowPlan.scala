package graft.tools

/** Scratch tool (not part of the library surface): print the AQE-final
  * executed plan of one registered query — `runMain graft.tools.ShowPlan
  * <queryName> [sfDir]`. */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_agg_tpch1")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Session.local(8, 8)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize AQE
    // raw fd write: survives any sbt log level (see Bench.scala)
    val out = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    // optional arg 2 = "formatted": emit explain("formatted") text (the
    // plans/r15 deliverable) instead of the executed-plan tree
    val txt =
      if (args.drop(2).headOption.contains("formatted"))
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      else df.queryExecution.executedPlan.toString()
    out.write(txt.getBytes("UTF-8"))
    out.flush()
    spark.stop()
  }
}
