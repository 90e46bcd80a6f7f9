package graft.tools

import org.apache.spark.sql.{functions => F}

/** Scratch profiling harness (not part of the library surface):
  * times labeled sub-plans of a slow query to locate the dominant cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.local()
    val emb = graft.T.load(spark, sfDir, "embeddings")
    emb.count() // warm
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("knn BnB") {
      noop(graft.similarity.Knn.exactKnnBnB(emb, emb, "vec_id",
        "embedding", 5))
    }
    var knnCk: org.apache.spark.sql.DataFrame = null
    time("knn BnB -> localCheckpoint") {
      knnCk = graft.similarity.Knn.exactKnnBnB(emb, emb, "vec_id",
        "embedding", 5).select("query_id", "neighbor_id")
        .localCheckpoint()
    }
    var edges: org.apache.spark.sql.DataFrame = null
    time("mutual edges") {
      edges = knnCk.as("e1").join(knnCk.as("e2"),
          F.col("e1.query_id") === F.col("e2.neighbor_id") &&
            F.col("e1.neighbor_id") === F.col("e2.query_id") &&
            F.col("e1.query_id") < F.col("e1.neighbor_id"))
        .select(F.col("e1.query_id").as("id1"),
          F.col("e1.neighbor_id").as("id2"))
      println(s"[profile]   n_edges=${edges.count()}")
    }
    time("connectedComponents") {
      noop(graft.dedup.Dedup.connectedComponents(edges))
    }
    time("full q207 (repeat)") {
      noop(graft.queries.MlQueries.queries("q207_mutual_knn")(spark, sfDir))
    }
    time("full q212 (repeat)") {
      noop(graft.queries.MiningQueries.queries("q212_lof")(spark, sfDir))
    }
    spark.stop()
  }
}
