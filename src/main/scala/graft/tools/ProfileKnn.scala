package graft.tools

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Scratch profiling harness (not part of the library surface):
  * times the phases of exactKnnBnB at sf0.1.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.plans.VectorExpressions.{dotF, normF}
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val emb = graft.T.load(spark, sfDir, "embeddings")
    println(s"[profile] corpus n=${emb.count()}")
    // warm
    graft.similarity.Knn.exactKnnBnB(emb, emb, "vec_id", "embedding", 5)
      .write.format("noop").mode("overwrite").save()

    val idCol = "vec_id"; val vecCol = "embedding"; val dim = 64
    var base: DataFrame = null
    time("base pin") {
      base = emb.select(F.col(idCol).as("neighbor_id"),
        F.col(vecCol).as("cvec"), normF(F.col(vecCol)).as("cn"))
        .localCheckpoint()
    }
    val bits = {
      val n = base.count()
      math.min(16, math.max(4,
        math.ceil(math.log(math.max(1.0, n / 256.0)) / math.log(2.0)).toInt))
    }
    println(s"[profile] bits=$bits")
    val planes = graft.similarity.Srp.hyperplanes(dim, bits, 11L)
    def cellOf(v: Column): Column = planes.zipWithIndex.map {
      case (h, i) =>
        F.when(dotF(v, F.typedlit(h)) > 0d, F.lit(1L << i))
          .otherwise(F.lit(0L))
    }.reduce(_ + _)
    val assigned = base
      .withColumn("cell", F.when(F.col("cn") === 0d, F.lit(-1L))
        .otherwise(cellOf(F.col("cvec"))))
    var cents: DataFrame = null
    time("cents (posexplode + 2 aggs)") {
      cents = assigned
        .filter(F.col("cell") >= 0)
        .select(F.col("cell"), F.col("cn").as("nrm"),
          F.posexplode(F.col("cvec")).as(Seq("pos", "x")))
        .withColumn("y", F.col("x").cast("double") / F.col("nrm"))
        .groupBy("cell", "pos").agg(F.avg("y").as("cy"))
        .groupBy("cell")
        .agg(F.expr(
          "transform(array_sort(collect_list(struct(pos, cy))), s -> cast(s.cy as float))")
          .as("cf"))
        .withColumn("cnorm", F.sqrt(dotF(F.col("cf"), F.col("cf"))))
        .localCheckpoint()
    }
    time("cellStats (radius agg + collect)") {
      assigned
        .join(F.broadcast(cents), "cell")
        .withColumn("ycdot", dotF(F.col("cvec"), F.col("cf"))
          / F.col("cn"))
        .groupBy("cell")
        .agg(F.sqrt(F.greatest(F.max(F.lit(1.0) - F.lit(2.0)
            * F.col("ycdot") + F.col("cnorm") * F.col("cnorm")),
          F.lit(0.0))).as("r"),
          F.first(F.col("cf")).as("cf"))
        .select("cell", "cf", "r").collect()
    }
    time("full BnB (warm, repeat)") {
      graft.similarity.Knn.exactKnnBnB(emb, emb, "vec_id", "embedding", 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full BnB (warm, repeat 2)") {
      graft.similarity.Knn.exactKnnBnB(emb, emb, "vec_id", "embedding", 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
