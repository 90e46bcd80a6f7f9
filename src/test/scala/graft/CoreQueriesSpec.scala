package graft

import org.apache.spark.sql.{functions => F}
import graft.ops.RelOps._

/** Reference-style equivalence tests (SURVEY.md §5.1: the reference
  * asserts cross-implementation agreement, not golden outputs).
  */
class CoreQueriesSpec extends SparkSpec {

  test("every registered query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    // deliberate rows-only entries (hash-family / approximate / stub ops
    // whose outputs are not oracle-expressible):
    val rowsOnly = Set("q42_simhash", "q46_knn_ivf", "q48_decode_stub",
      "q86_frames_stub")
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without query: $stale")
  }

  test("q1 `by` expression form agrees with direct groupBy.agg closure form") {
    // reference test/grouping.jl:18-21 equivalence style
    val li = T.load(spark, sf, "lineitem")
    val viaBy = li.by(Seq("l_returnflag"), "n" -> "count(*)",
      "s" -> "round(sum(l_quantity),2)")
    val direct = li.groupBy("l_returnflag")
      .agg(F.count(F.lit(1)).as("n"),
           F.round(F.sum("l_quantity"), 2).as("s"))
    assert(viaBy.exceptAll(direct).isEmpty && direct.exceptAll(viaBy).isEmpty)
  }

  test("vcat fills missing columns with null and keeps all rows") {
    val c = T.load(spark, sf, "customer")
    val s2 = T.load(spark, sf, "supplier")
    val un = c.basedOn("k" -> "c_custkey", "seg" -> "c_mktsegment")
      .vcat(s2.basedOn("k" -> "s_suppkey"))
    assert(un.count() == c.count() + s2.count())
    assert(un.filter(F.col("seg").isNull).count() == s2.count())
  }

  test("full outer join keeps left-only and right-only keys") {
    val q = SparkEntry.queries("q05_join_outer")(spark, sf)
    assert(q.filter(F.col("total").isNull).count() > 0)
    assert(q.filter(F.col("n_items").isNull).count() > 0)
  }

  test("topK equals sort+limit") {
    val o = T.load(spark, sf, "orders")
    val a = o.topK(5, Ordering("o_totalprice", desc = true),
                      Ordering("o_orderkey")).collect()
    val b = o.orderBy(F.col("o_totalprice").desc_nulls_last,
                      F.col("o_orderkey").asc_nulls_first)
      .limit(5).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("dedupFirst keeps exactly the first row per key in given order") {
    val o = T.load(spark, sf, "orders")
    val d = o.dedupFirst(Seq("o_custkey"), "o_orderkey")
    assert(d.count() == o.select("o_custkey").distinct().count())
    // the kept orderkey is the min per custkey
    val viaMin = o.groupBy("o_custkey")
      .agg(F.min("o_orderkey").as("o_orderkey"))
    assert(d.select("o_custkey", "o_orderkey").exceptAll(viaMin).isEmpty)
  }
}
