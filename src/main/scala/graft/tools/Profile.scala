package graft.tools

import org.apache.spark.sql.{functions => F}

/** Scratch profiling harness (not part of the library surface):
  * times labeled sub-plans of a slow query to locate the dominant cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.local()
    val li = graft.T.load(spark, sfDir, "lineitem")
    li.count() // warm
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    time("stats agg (lean)") {
      val aggs = cols.flatMap { c =>
        Seq(F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double")),
          F.expr(s"round(avg($c), 6)"), F.expr(s"count($c)").cast("long"))
      } :+ F.count(F.lit(1))
      li.agg(aggs.head, aggs.tail: _*).first()
    }
    time("exactMulti w/ stats (refine+collect)") {
      val stats = Map(
        "l_quantity" -> ((1.0, 50.0, 600572L)),
        "l_extendedprice" -> ((900.91, 104949.5, 600572L)),
        "l_discount" -> ((0.0, 0.1, 600572L)))
      graft.ops.Quantiles.exactMulti(li, cols, Seq(0.25, 0.5, 0.75), stats)
    }
    time("exactMulti again (warm)") {
      val stats = Map(
        "l_quantity" -> ((1.0, 50.0, 600572L)),
        "l_extendedprice" -> ((900.91, 104949.5, 600572L)),
        "l_discount" -> ((0.0, 0.1, 600572L)))
      graft.ops.Quantiles.exactMulti(li, cols, Seq(0.25, 0.5, 0.75), stats)
    }
    time("min/max/avg/count only") {
      li.agg(F.min("l_quantity"), F.max("l_quantity"), F.avg("l_quantity"),
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.avg("l_extendedprice"), F.min("l_discount"), F.max("l_discount"),
        F.avg("l_discount")).collect()
    }
    time("percentile x1 col") {
      li.agg(F.expr("percentile(l_quantity, array(0.25,0.5,0.75))")).collect()
    }
    time("percentile x3 cols") {
      li.agg(F.expr("percentile(l_quantity, array(0.25,0.5,0.75))"),
        F.expr("percentile(l_extendedprice, array(0.25,0.5,0.75))"),
        F.expr("percentile(l_discount, array(0.25,0.5,0.75))")).collect()
    }
    time("percentile high-card col only") {
      li.agg(F.expr("percentile(l_extendedprice, array(0.25,0.5,0.75))"))
        .collect()
    }
    time("approx_percentile x3") {
      li.agg(F.expr("approx_percentile(l_quantity, array(0.25,0.5,0.75), 10000)"),
        F.expr("approx_percentile(l_extendedprice, array(0.25,0.5,0.75), 10000)"),
        F.expr("approx_percentile(l_discount, array(0.25,0.5,0.75), 10000)"))
        .collect()
    }
    import graft.ops.StatOps._
    time("describeCols (current q21)") {
      li.describeCols(cols).collect()
    }
    time("describeColsExact (histogram refine)") {
      li.describeColsExact(cols).collect()
    }
    time("describeColsExact again (warm)") {
      li.describeColsExact(cols).collect()
    }
    spark.stop()
  }
}
