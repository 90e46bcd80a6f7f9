package graft

import org.apache.spark.sql.{functions => F}
import graft.queries.EvalQueries

/** Closed-form hand checks for the wave-9 eval/governance operators,
  * exercising the SAME cores the registered queries run (btPairs /
  * btFit / Graph.labelPropagation), plus invariant checks of the
  * audit-style queries on the smallest corpus — complementing the
  * sf-oracle parity gate.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("Bradley-Terry MM fit reaches the 2-item fixed point exactly") {
    // A beats B 3 of 4: wins A=3, B=1; denom = 4/(wA+wB) = 2 at the
    // start, so raw = (1.5, 0.5) with mean 1 — a fixed point the
    // per-iteration rounding must preserve through all 5 rounds.
    val pa = Seq(("A", "B", 4L, 3L)).toDF("b1", "b2", "n", "w1")
    val m = EvalQueries.btFit(pa, iters = 5)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(m("A") == ((3L, 1.5)) && m("B") == ((1L, 0.5)))
  }

  test("btPairs counts strict per-order brand wins") {
    // order 1: brandX qty 5+1=6 vs brandY 4 -> X wins; order 2: tie
    // (3 vs 3) excluded; order 3: Y 9 beats X 2.
    val li = Seq((1L, 101L, 5.0), (1L, 102L, 1.0), (1L, 201L, 4.0),
      (2L, 101L, 3.0), (2L, 201L, 3.0),
      (3L, 102L, 2.0), (3L, 201L, 9.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val part = Seq((101L, "X"), (102L, "X"), (201L, "Y"))
      .toDF("p_partkey", "p_brand")
    val out = EvalQueries.btPairs(li, part).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      == (("X", "Y", 2L, 1L)))
  }

  test("label propagation converges per component to the min label") {
    // two disjoint triangles: self-vote + min-tie-break pulls each
    // triangle to its smallest node id within one round
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val out = graft.ops.Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("stupid-backoff scores are log-probabilities (<= 0)") {
    val rows = EvalQueries.queries("q235_stupid_backoff")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) <= 0.0, s"S>1 for doc ${r.getLong(0)}")
    }
  }

  test("k-anonymity risk only shrinks under generalization") {
    val rows = EvalQueries.queries("q237_kanon_audit")(spark, sf)
      .orderBy("level").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    // merging quasi-identifier columns can only merge classes: class
    // count and rows-at-risk are non-increasing in the level
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 <= a._2 && b._3 <= a._3 })
  }

  test("delta-view merge equals the from-scratch aggregate") {
    val got = EvalQueries.queries("q238_delta_view")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val want = T.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(F.count(F.lit(1)).as("n"),
        F.round(F.sum("o_totalprice"), 6).as("sp"),
        F.round(F.max("o_totalprice"), 6).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("CM join estimate and sliding-HLL gates hold on sf0.001") {
    val cm = EvalQueries.queries("q233_cm_join_est")(spark, sf).collect()
    assert(cm.length == 1 && cm.head.getBoolean(1) && cm.head.getBoolean(2))
    val sl = EvalQueries.queries("q239_sliding_hll")(spark, sf).collect()
    assert(sl.nonEmpty && sl.forall(_.getBoolean(2)))
  }

  test("RTBF cascade conserves rows and is consistent across tables") {
    val m = EvalQueries.queries("q234_rtbf_cascade")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    m.values.foreach { case (t, rm, kp) => assert(t == rm + kp) }
    // removal counts match an independent direct computation
    val ords = T.load(spark, sf, "orders")
    assert(m("orders")._2 ==
      ords.filter(F.col("o_custkey") % 97 === 0).count())
    assert(m("lineitem")._2 ==
      T.load(spark, sf, "lineitem").join(
        ords.filter(F.col("o_custkey") % 97 === 0).select("o_orderkey"),
        F.col("l_orderkey") === F.col("o_orderkey"), "left_semi").count())
  }
}
