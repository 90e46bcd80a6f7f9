package graft.tools

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch profiling harness (not part of the library surface):
  * decomposes the iterative-graph queries into phases and counts
  * Spark jobs per phase, to locate per-round fixed cost vs real work.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.local()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = ()
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get() - j0}")
    }
    // warm
    graft.T.load(spark, sfDir, "lineitem").count()

    // ---- q246 PPR decomposition
    val ol = graft.T.load(spark, sfDir, "lineitem")
      .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint()
    var edges: DataFrame = null
    time("q246 edges (pair self-join + filter)") {
      val edges0 = ol.toDF("o", "a")
        .join(ol.toDF("o2", "b"),
          F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
        .filter(F.col("nab") >= 2)
      edges = edges0.select(F.col("a").as("src"), F.col("b").as("dst"))
        .unionAll(edges0.select(F.col("b").as("src"), F.col("a").as("dst")))
        .localCheckpoint()
    }
    val seeds = graft.T.load(spark, sfDir, "orders")
      .join(graft.T.load(spark, sfDir, "customer")
        .filter(F.col("c_mktsegment") === "BUILDING")
        .select("c_custkey"),
        F.col("o_custkey") === F.col("c_custkey"), "left_semi")
      .select(F.col("o_orderkey").as("o"))
      .join(ol, "o")
      .select(F.col("p").as("node")).distinct().localCheckpoint()
    time("q246 PPR loop (edges+seeds pinned)") {
      noop(graft.ops.Graph.personalizedPageRank(edges, seeds, 3, 0.85))
    }
    time("q246 full (repeat)") {
      noop(graft.queries.EvalQueries.queries("q246_ppr")(spark, sfDir))
    }

    // ---- q232 label prop decomposition
    var e232: DataFrame = null
    time("q232 edges") {
      val ol2 = graft.T.load(spark, sfDir, "lineitem")
        .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
        .distinct()
      e232 = ol2.toDF("o", "a")
        .join(ol2.toDF("o2", "b"),
          F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
        .filter(F.col("nab") >= 2)
        .select("a", "b").localCheckpoint()
    }
    time("q232 labelProp loop (edges pinned)") {
      noop(graft.ops.Graph.labelPropagation(e232, 4))
    }

    // ---- q102 CC star decomposition
    var pairs: DataFrame = null
    time("q102 minhash pairs") {
      val docs = graft.T.load(spark, sfDir, "documents")
        .withColumn("sh",
          graft.plans.TextExpressions.wordShingles(F.col("text"), 3))
      pairs = graft.dedup.Dedup
        .minhashNearDups(docs, "doc_id", "sh", 0.8)
        .select("id1", "id2").localCheckpoint()
    }
    time("q102 CC star (pairs pinned)") {
      noop(graft.dedup.Dedup.connectedComponentsStar(pairs))
    }

    // ---- q150 pagerank decomposition
    var e150: DataFrame = null
    time("q150 edges") {
      val cs = graft.T.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(graft.T.load(spark, sfDir, "orders")
          .select("o_orderkey", "o_custkey"),
          F.col("l_orderkey") === F.col("o_orderkey"))
        .select((F.col("o_custkey") * 2).as("c"),
          (F.col("l_suppkey") * 2 + 1).as("sv"))
        .distinct()
        .localCheckpoint()
      e150 = cs.select(F.col("c").as("src"), F.col("sv").as("dst"))
        .unionAll(cs.select(F.col("sv").as("src"), F.col("c").as("dst")))
    }
    time("q150 pageRank loop") {
      noop(graft.ops.Graph.pageRank(e150, 3, 0.85))
    }
    spark.stop()
  }
}
