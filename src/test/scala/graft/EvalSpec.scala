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

  test("btFit driver path == plan-side loop, column for column") {
    // r15: btFit collects the bounded pair aggregate and fits on the
    // driver; pin bit-equality against the original plan-side loop on
    // an uneven tournament (11 items, incomplete pairing, skewed wins
    // — mean-normalization and 8-dp rounding both exercised).
    val pairs = for {
      i <- 1 to 11; j <- (i + 1) to 11
      if (i + j) % 3 != 0
    } yield (f"I$i%02d", f"I$j%02d", (i * j % 7 + 2).toLong,
      (i % (j % 5 + 1)).toLong)
    val pa = pairs.toDF("b1", "b2", "n", "w1")
    val d = EvalQueries.btFitDriver(pa, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val p = EvalQueries.btFitPlan(pa.localCheckpoint(), iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(d.toSeq == p.toSeq)
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

  test("labelProp's one-agg mode() round equals the two-agg argmax") {
    // the round-12 one-exchange round uses mode(lab, deterministic):
    // most frequent label, ties to the SMALLEST — pin it against the
    // explicit (count desc, label asc) argmax on a tie-heavy graph
    // (even cycles + bridges force repeated count ties)
    val cyc = (0L until 12L).map(i => (i, (i + 1) % 12))
    val edges = (cyc ++ Seq((3L, 20L), (20L, 21L), (21L, 22L),
      (7L, 30L), (30L, 31L)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a", "b")
    for (rounds <- Seq(1, 2, 4)) {
      val got = graft.ops.Graph.labelPropagation(edges, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // reference: the pre-round-12 two-aggregation formulation,
      // replayed on the same directed relation (both directions +
      // self-loops), same fixed round count
      val und = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
      val dir = und.flatMap(e => Seq(e, e.swap)) ++ nodes.map(n => (n, n))
      var lab = nodes.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lab = dir.groupBy(_._2).map { case (dst, es) =>
          val counts = es.groupBy(e => lab(e._1))
            .map { case (l, g) => (l, g.size) }
          dst -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      assert(got == lab, s"rounds=$rounds")
    }
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

  test("shard balance covers all docs and serpentine keeps spread low") {
    val rows = EvalQueries.queries("q240_shard_balance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == (0L to 7L))
    assert(rows.map(_._2).sum == T.load(spark, sf, "documents").count())
    val toks = rows.map(_._3)
    // longest-first serpentine dealing should land far from the
    // worst case; assert the spread gate loosely (and consistently
    // with the reported column)
    assert(rows.head._4 >= 0.0)
    assert(math.abs(rows.head._4
      - (toks.max - toks.min) / (toks.sum.toDouble / 8)) < 1e-6)
  }

  test("kappa is chance-corrected below accuracy, both in range") {
    val r = EvalQueries.queries("q241_cohen_kappa")(spark, sf)
      .collect().head
    val (acc, kap) = (r.getDouble(1), r.getDouble(2))
    assert(acc >= 0.0 && acc <= 1.0)
    assert(kap <= acc + 1e-9 && kap >= -1.0)
  }

  test("MMR greedy scores are non-increasing and picks distinct") {
    val rows = EvalQueries.mmrSelect(
      T.load(spark, sf, "embeddings"), k = 5, lam = 0.5)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1 to 5))
    assert(rows.map(_._2).distinct.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 1e-9,
        s"score grew at step ${b._1}: ${a._3} -> ${b._3}")
    }
  }

  test("CUPED adjusted means stay centered, variants partition users") {
    val rows = EvalQueries.queries("q243_cuped")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L))
    assert(rows.map(_._2).sum ==
      T.load(spark, sf, "events").select("user_id").distinct().count())
    // adjustment must not blow up the metric
    rows.foreach { case (_, _, post, adj, vr) =>
      assert(math.abs(adj - post) < math.abs(post) + 1.0)
      assert(vr < 1.0)
    }
  }

  test("personalized PageRank confines mass to the seed component") {
    // two disjoint triangles, seed in the first: restart + flow can
    // never reach the second component, and total mass conserves
    // (undirected graph -> no dangling loss)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = graft.ops.Graph.personalizedPageRank(edges, seeds,
      iters = 3).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.size == 6)
    assert(Seq(10L, 11L, 12L).forall(out(_) == 0.0))
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(1L) > out(2L) && out(2L) == out(3L))
  }

  test("key-skew report is internally consistent") {
    val rows = EvalQueries.queries("q244_key_skew")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSet ==
      Set("l_partkey", "l_suppkey", "o_custkey"))
    rows.foreach { case (k, nKeys, mx, p50, p99, share, cv) =>
      assert(nKeys > 0 && mx >= 1)
      assert(p50 <= p99 + 1e-9 && p99 <= mx + 1e-9, k)
      assert(share > 0.0 && share <= 1.0)
      assert(cv >= 0.0)
    }
  }

  test("near-dup explanations carry sorted shared shingles") {
    val rows = EvalQueries.queries("q245_neardup_explain")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.85)
      // top_shared is '|'-joined (scalar-only final projections — the
      // gate's canonicalizer cannot sort list cells)
      val top = r.getString(4).split('|').toSeq.filter(_.nonEmpty)
      assert(r.getInt(3) >= top.length && top.length <= 3)
      assert(top == top.sorted)
    }
  }

  test("k-center picks the exact farthest-point sequence on a line") {
    // points on a line at 0, 10, 5, 1 (ids 1..4): start at min id,
    // then greedy max-min distance gives 2 (d=10), 3 (d=5), 4 (d=1)
    val emb = Seq((1L, Array(0f, 0f)), (2L, Array(10f, 0f)),
      (3L, Array(5f, 0f)), (4L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = EvalQueries.kCenterSelect(emb, k = 4)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 0.0), (2L, 10.0), (3L, 5.0), (4L, 1.0)))
    // k beyond the candidate count returns the PARTIAL selection
    // (round-6 advice: the greedy loop used to throw on empty collect)
    val partial = EvalQueries.kCenterSelect(emb, k = 10).collect()
    assert(partial.length == 4)
  }

  test("vocabulary growth curve is monotone with diminishing TTR") {
    val rows = EvalQueries.queries("q247_vocab_growth")(spark, sf)
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 && b._3 >= a._3)
    case _ => ()
    }
    assert(rows.map(_._4).sum == rows.last._3) // new types sum to vocab
    assert(rows.last._5 <= rows.head._5) // Heaps: type/token ratio falls
  }

  test("seasonal strengths are valid fractions on real hourly data") {
    val rows = EvalQueries.queries("q248_seasonal_decomp")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, ft, fs) =>
      assert(n > 0, t)
      assert(ft >= 0.0 && ft <= 1.0, s"$t f_trend=$ft")
      assert(fs >= 0.0 && fs <= 1.0, s"$t f_seasonal=$fs")
    }
  }

  test("permutation test yields a valid deterministic p-value") {
    val r1 = EvalQueries.queries("q250_perm_test")(spark, sf)
      .collect().head
    val r2 = EvalQueries.queries("q250_perm_test")(spark, sf)
      .collect().head
    assert(r1.getDouble(2) > 0.0 && r1.getDouble(2) <= 1.0)
    assert(r1.getDouble(1) == r2.getDouble(1)
      && r1.getDouble(2) == r2.getDouble(2)) // hash perms, not RNG
  }

  test("class-balance oversampling hits the ceil-replication contract") {
    val rows = EvalQueries.queries("q251_class_balance")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val mxc = rows.map(_._2).max
    rows.foreach { case (lang, before, rep, after, _) =>
      assert(after == before * rep, lang)
      assert(rep == (mxc + before - 1) / before, lang)
      assert(after >= mxc && after < mxc + before, lang)
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
  }

  test("dup-label-noise report is a consistent scalar audit") {
    val r = EvalQueries.queries("q252_dup_label_noise")(spark, sf)
      .collect().head
    val (n, lm, cs) = (r.getLong(0), r.getLong(1), r.getLong(3))
    assert(n > 0 && lm <= n && cs <= n)
    assert(math.abs(r.getDouble(2) - lm.toDouble / n) < 1e-5)
    assert(math.abs(r.getDouble(4) - cs.toDouble / n) < 1e-5)
  }

  test("Hill tail index is positive and matches a direct computation") {
    val rows = EvalQueries.queries("q253_hill_tail")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.length == 1)
    assert(rows.head._1 == 50 && rows.head._2 > 0.0)
    val lens = T.load(spark, sf, "documents")
      .select("n_chars", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (-t._1, t._2)).map(_._1.toDouble)
    val want = 1.0 / (lens.take(50).map(math.log).sum / 50
      - math.log(lens(50)))
    assert(math.abs(rows.head._2 - want) < 1e-5)
  }

  test("grouping sets label each set with the ANSI grouping_id") {
    val rows = EvalQueries.queries("q256_grouping_sets")(spark, sf)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
    val total = T.load(spark, sf, "orders").count()
    // gid 3 = grand total (both columns null); gid 0 rows partition it
    assert(rows.filter(_._3 == 3L).map(_._4).sum == total)
    assert(rows.filter(_._3 == 0L).map(_._4).sum == total)
    rows.foreach { case (a, b, gid, _) =>
      assert(gid == (if (a.isEmpty) 2L else 0L)
        + (if (b.isEmpty) 1L else 0L))
    }
  }

  test("SRM check is clean on the balanced parity assignment") {
    val r = EvalQueries.queries("q257_srm_check")(spark, sf)
      .collect().head
    assert(r.getLong(0) ==
      T.load(spark, sf, "events").select("user_id").distinct().count())
    assert(r.getDouble(1) >= 0.0 && r.getBoolean(2))
  }

  test("BPE pair iteration finds the true argmax merge") {
    val rows = EvalQueries.queries("q258_bpe_pairs")(spark, sf)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.map(_._3).toSeq == (1 to 10))
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 <= a._2 })
    // replay the winning pair count directly
    val want = T.load(spark, sf, "documents")
      .select(F.explode(
        graft.plans.TextExpressions.wordTokens(F.col("text"))).as("w"))
      .filter(F.length(F.col("w")) >= 2)
      .select(F.explode(F.expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("p"))
      .groupBy("p").count()
      .orderBy(F.col("count").desc, F.col("p").asc)
      .limit(1).collect().head
    assert(rows.head._1 == want.getString(0)
      && rows.head._2 == want.getLong(1))
  }

  test("lateness audit partitions every event after the first") {
    val rows = EvalQueries.queries("q259_lateness_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = T.load(spark, sf, "events").count()
    assert(rows.map(_._2).sum == total - 1) // first arrival has no prior
    val bounds = Map("in_order" -> 0L, "le_1m" -> 60L, "le_1h" -> 3600L,
      "le_1d" -> 86400L, "gt_1d" -> Long.MaxValue)
    rows.foreach { case (b, n, mx) =>
      assert(bounds.contains(b) && n > 0)
      assert(mx <= bounds(b), s"$b max_late=$mx")
    }
  }

  test("negative samples never collide with real interactions") {
    val out = EvalQueries.queries("q260_negative_sample")(spark, sf)
    val inter = T.load(spark, sf, "orders")
      .join(T.load(spark, sf, "lineitem"),
        F.col("o_orderkey") === F.col("l_orderkey"))
      .select(F.col("o_custkey").as("user_id"),
        F.col("l_partkey").as("neg_item"))
      .distinct()
    assert(out.join(inter, Seq("user_id", "neg_item"), "left_semi")
      .count() == 0)
    // every sampled item is a REAL part key: the domain is 0-based
    // (p_partkey in 0..np-1 at every SF), so `hash % np` is exact
    val parts = T.load(spark, sf, "part")
      .select(F.col("p_partkey").as("neg_item"))
    assert(out.join(parts, Seq("neg_item"), "left_anti").count() == 0)
    val perUser = out.groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n"), F.max("rank").as("mr"))
      .collect()
    perUser.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(2) == r.getLong(1))
    }
  }

  test("tolerance as-of nulls stale matches, keeps fresh ones") {
    val left = Seq((1L, 1L, 50L), (2L, 1L, 150L), (3L, 1L, 200L))
      .toDF("id", "k", "tsec")
    val right = Seq((1L, 100L, 5.0)).toDF("k", "tsec", "v")
    val out = graft.ops.AsOfJoin.backwardWithin(left, right,
      keyCols = Seq("k"), tsCol = "tsec", valueCols = Seq("v"),
      tol = 60L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(1L -> None,       // no prior row
      2L -> Some(5.0),                  // 50 s old: fresh
      3L -> None))                      // 100 s old: stale -> null
  }

  test("share-of-parent fractions sum to one at each level") {
    val rows = EvalQueries.queries("q262_share_of_parent")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    // nation shares sum to ~1 within each region
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._2).sum - 1.0) < 1e-4)
    }
    // region shares (one value per region) sum to ~1 overall
    val regionShares = rows.groupBy(_._1).map(_._2.head._3)
    assert(math.abs(regionShares.sum - 1.0) < 1e-4)
  }

  test("session entropy is bounded by log of the fan-out") {
    val rows = EvalQueries.queries("q263_session_entropy")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val nTypes = T.load(spark, sf, "events")
      .select("event_type").distinct().count()
    rows.foreach { case (t, n, h) =>
      assert(n > 0, t)
      assert(h >= 0.0 && h <= math.log(nTypes.toDouble) + 1e-9, s"$t h=$h")
    }
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
