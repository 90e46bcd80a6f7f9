package graft

import org.apache.spark.sql.{DataFrame, functions => F}

/** sf1-equivalent data generator (r8/r9 verdict stretch task 9): the
  * driver ships sf{0.001,0.01,0.1}; the full-suite single-point sf1
  * claim needs a 10× volume with COHERENT keys, so every clone i
  * shifts every entity key by i·10⁸ consistently across tables —
  * orders still join customers, lineitems still join orders/parts/
  * suppliers, events keep 10× disjoint user populations. region and
  * nation are dimensions shared by all clones (nationkeys unshifted).
  * documents/embeddings clones shift ids but keep payloads, so the
  * dedup family sees a deliberately dup-HEAVY corpus (every doc has 9
  * exact twins) — the same worst-realistic-load convention as
  * ScaleProbe, called out wherever the numbers are published.
  *
  * Run: sbt "Test/runMain graft.Sf1Gen [outDir]"   (default /tmp/sf1)
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1")
    val spark = Session.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val S = 100000000L
    val F10 = 10

    // events and lineitem must be single FILES: the streaming queries
    // glob-filter on the literal file name (see StreamScaleProbe).
    // Compute stays parallel via localCheckpoint; only the final write
    // serializes through one task.
    val singleFile = Set("events", "lineitem")

    def write(df: DataFrame, t: String): Unit =
      if (!singleFile(t)) df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      else TestIO.writeSingleParquet(df, out, s"$t.parquet")

    def rep(t: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$sf/$t.parquet")
      val clones = (0 until F10).map { i =>
        keyCols.foldLeft(base)((d, k) =>
          d.withColumn(k, F.col(k) + F.lit(i * S)))
      }
      write(clones.reduce(_ unionAll _), t)
    }

    // shared dimensions, one copy
    write(spark.read.parquet(s"$sf/region.parquet"), "region")
    write(spark.read.parquet(s"$sf/nation.parquet"), "nation")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    rep("documents", Seq("doc_id"))
    // embeddings get a tiny deterministic per-clone jitter on top of
    // the id shift: exact clone vectors give every point 9
    // zero-distance twins, and distance-tie inflation blows up kNN /
    // LOF neighborhoods quadratically (measured 35.7× at 10× for
    // q212 before this) — an artifact of the replication convention,
    // not of the operators. 1e-4 on one component breaks ties while
    // leaving the distance distribution intact. documents stay exact
    // twins deliberately (dup-heavy is the WORST realistic load for
    // the text-dedup family, same convention as ScaleProbe).
    locally {
      val base = spark.read.parquet(s"$sf/embeddings.parquet")
      val clones = (0 until F10).map { i =>
        base.withColumn("vec_id", F.col("vec_id") + F.lit(i * S))
          .withColumn("embedding", F.expr(
            s"transform(embedding, (x, j) -> CASE WHEN j = 0 " +
              s"THEN cast(x + $i * 1.0e-4 as float) ELSE x END)"))
      }
      write(clones.reduce(_ unionAll _), "embeddings")
    }
    println(s"[sf1gen] wrote 10x sf0.1 -> $out")
    spark.stop()
  }
}
