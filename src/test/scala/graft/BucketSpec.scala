package graft

import org.apache.spark.sql.{functions => F}

/** Bucketed co-located join: the SCALE.md claim that pre-bucketing
  * eliminates the join shuffle, proven on the physical plan. This is
  * the 100 TB layout decision for repeated fact-fact joins (SURVEY §4.1
  * IndexedVector analog: layout beats per-query work).
  */
class BucketSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val o = T.load(s, sf, "orders")
      val li = T.load(s, sf, "lineitem")
        .groupBy("l_orderkey").agg(F.count(F.lit(1)).as("n_items"))
      o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val j = s.table("orders_b").join(s.table("lineitem_b"),
        F.col("o_orderkey") === F.col("l_orderkey"))
      j.collect() // execute so AQE finalizes
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the same join WITHOUT bucketing does shuffle
      val plain = o.join(li, F.col("o_orderkey") === F.col("l_orderkey"))
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString()
        .contains("Exchange hashpartitioning"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
