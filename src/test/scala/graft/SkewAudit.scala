package graft

import org.apache.spark.sql.{functions => F}

/** One-off measurement harness (test scope, not shipped): does the
  * q221 item-CF plan survive a power-law hot item at ~10× sf0.1
  * volume? Injects a synthetic item into 30% of all baskets, then
  * replicates the basket relation 10× under shifted order keys, and
  * times [[graft.queries.RetrievalQueries.itemCf]] against the same
  * relation without the hot item. The plan's skew defenses under test:
  * per-order pair fan-out (bounded by basket size², unaffected by item
  * popularity), map-side partial aggregation of the (i, j) pair counts
  * (a hot pair reaches the reducer once per map task, not once per
  * order), and the bounded-memory TopK ranking (the hot item's ~20k
  * candidate partners collapse to k per task before the shuffle).
  * Numbers recorded in SCALE.md §round-6.
  *
  * Run: sbt "Test/runMain graft.SkewAudit"
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val oi = T.load(spark, "/root/testdata/sf0.1", "lineitem")
      .select(F.col("l_orderkey").as("ok"), F.col("l_partkey").as("pk"))
      .distinct()
    def rep10(df: org.apache.spark.sql.DataFrame) =
      (0 until 10).map(i => df.select(
        (F.col("ok") + F.lit(i.toLong * 1000000000L)).as("ok"),
        F.col("pk"))).reduce(_ unionAll _)
    val hot = oi.select("ok").distinct()
      .filter(F.expr("ok % 10 < 3")).withColumn("pk", F.lit(-1L))
    def run(name: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = graft.queries.RetrievalQueries.itemCf(d, 2, 5).count()
      println(f"[skew-audit] $name: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    run("baseline 10x sf0.1", rep10(oi))
    run("hot-item 10x sf0.1", rep10(oi.unionAll(hot.select("ok", "pk"))))

    // ---- prefix-Jaccard skew (r7 verdict stretch task 8) ----------
    // q157/q182's AllPairs/PPJoin prefixes assume the df distribution
    // keeps hot shingles out of probe prefixes. Adversarial input: ONE
    // boilerplate shingle injected into 30% of all docs (the "same
    // footer on a third of the web" case). The defense under test is
    // the rarity order itself — df(hot) = 0.3·N puts it at the very
    // END of every doc's rarity-ranked shingle list, while a τ = 1/2
    // prefix covers only the first ~half, so the hot shingle must
    // never enter the candidate join's index or probe side.
    val docs = T.load(spark, "/root/testdata/sf0.1", "documents")
      .select(F.col("doc_id"), graft.plans.TextExpressions
        .wordShingles(F.col("text"), 3).as("sh"))
    def jrun(name: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup.jaccardPairsPrefix(d, "doc_id", "sh", 1, 2)
        .count()
      println(f"[skew-audit] $name: pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val hotDocs = docs.select(F.col("doc_id"),
      F.when(F.col("doc_id") % 10 < 3,
          F.array_union(F.col("sh"), F.array(F.lit("x hot footer"))))
        .otherwise(F.col("sh")).as("sh"))
    jrun("prefix-jaccard baseline sf0.1", docs)
    jrun("prefix-jaccard hot-shingle-30pct sf0.1", hotDocs)
    spark.stop()
  }
}
