package graft

import org.apache.spark.sql.{functions => F}
import graft.queries.TrainQueries

/** Closed-form and invariant checks for the wave-23 tokenizer-training
  * / streaming-decontam operators, complementing the sf-oracle gate.
  */
class TrainSpec extends SparkSpec {
  import spark.implicits._

  test("bpe pair counts: weighted adjacent pairs over paren-wrapped vocab") {
    val vocab = Seq(("(a)(a)(a)(a)", 2L), ("(a)(b)", 3L))
      .toDF("rep", "c")
    val got = TrainQueries.bpePairCounts(vocab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // run of 4 a's = 3 adjacent (a,a) pairs, weight 2 -> 6
    assert(got == Map(("a", "a") -> 6L, ("a", "b") -> 3L))
  }

  test("paren-wrapped replace is exact greedy BPE, including runs") {
    // the space-delimited representation gets the run-of-4 case wrong
    // ([aa, a, a]); the paren wrap shares no delimiter between
    // adjacent matches, so replace-all IS leftmost greedy merging
    val out = spark.sql(
      "SELECT replace('(a)(a)(a)(a)', '(a)(a)', '(aa)') m1, " +
        "replace('(c)(a)(b)(a)(b)', '(a)(b)', '(ab)') m2, " +
        "replace('(xa)(b)', '(a)(b)', '(ab)') m3").collect()(0)
    assert(out.getString(0) == "(aa)(aa)")
    assert(out.getString(1) == "(c)(ab)(ab)")
    assert(out.getString(2) == "(xa)(b)") // no mid-token false match
  }

  test("q281: k ranked merges, argmax counts non-increasing") {
    val rows = TrainQueries.queries("q281_bpe_train")(spark, sf)
      .orderBy("merge_rank").collect()
    assert(rows.length == TrainQueries.BpeMerges)
    assert(rows.map(_.getLong(0)).toSeq ==
      (1L to TrainQueries.BpeMerges.toLong))
    // each occurrence of a round-(r+1) pair maps to a distinct
    // round-r adjacency, so the argmax can never grow across rounds
    val ns = rows.map(_.getLong(3))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getLong(3) > 0L)
    }
  }

  test("q283: u1 matches a driver-side exact rank-sum on the corpus") {
    val row = TrainQueries.queries("q283_mann_whitney")(spark, sf)
      .collect()(0)
    val (n1, n2, u1) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    // independent reimplementation: collect the two samples (test-only
    // — the query itself never collects data rows) and average-rank
    val vals = T.load(spark, sf, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "click", r.getDouble(1)))
    val sorted = vals.sortBy(_._2)
    val avgRank = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val r = (i + 1 + j) / 2.0 // mean of ranks i+1 .. j
      (i until j).foreach(avgRank(_) = r)
      i = j
    }
    val r1 = sorted.zipWithIndex.collect {
      case ((true, _), ix) => avgRank(ix)
    }.sum
    val exp1 = vals.count(_._1).toLong
    assert(n1 == exp1 && n2 == vals.length - exp1)
    assert(math.abs(u1 - (r1 - n1 * (n1 + 1) / 2.0)) < 1e-6)
    assert(u1 >= 0 && u1 <= n1.toDouble * n2)
    assert(row.getBoolean(4) == (math.abs(row.getDouble(3)) > 1.959964))
  }

  test("q284: BH rejections form a rank prefix under monotone p") {
    val rows = TrainQueries.queries("q284_bh_fdr")(spark, sf)
      .orderBy("bh_rank").collect()
    assert(rows.length == 25) // 25 brands
    val ps = rows.map(_.getDouble(3))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    // step-up: rejected iff rank <= k, so flags are a prefix
    val flags = rows.map(_.getBoolean(5))
    assert(flags.zip(flags.tail).forall { case (a, b) => a || !b })
    // and k really is the LAST rank satisfying p <= rank * alpha / m
    val k = (1 to 25).filter(i => ps(i - 1) <= i * 0.05 / 25)
      .lastOption.getOrElse(0)
    assert(flags.count(identity) == k)
  }

  test("q285: calibrated logloss beats the base-rate model") {
    val row = TrainQueries.queries("q285_platt_scale")(spark, sf)
      .collect()(0)
    val logloss = row.getDouble(3)
    val q = T.load(spark, sf, "lineitem")
      .agg(F.avg(F.when(F.col("l_returnflag") === "R", 1.0d)
        .otherwise(0.0d))).collect()(0).getDouble(0)
    val base = -(q * math.log(q) + (1 - q) * math.log(1 - q))
    // 3 Newton rounds from (0,0) must at least reach the intercept-
    // only optimum (and never the uninformative ln 2)
    assert(logloss <= base + 1e-4)
    assert(logloss < math.log(2))
    assert(row.getLong(2) > 0)
  }

  test("q286: l-distribution covers every QI group exactly once") {
    val rows = TrainQueries.queries("q286_ldiversity")(spark, sf)
      .collect()
    val groups = T.load(spark, sf, "customer")
      .select(F.col("c_nationkey"), F.col("c_mktsegment"))
      .distinct().count()
    val custs = T.load(spark, sf, "customer").count()
    assert(rows.map(_.getLong(1)).sum == groups)
    assert(rows.map(_.getLong(2)).sum == custs)
    rows.foreach(r => assert(r.getBoolean(3) == (r.getLong(0) < 3)))
  }

  test("q287: predicted links are non-edges with positive AA score") {
    val rows = TrainQueries.queries("q287_link_predict")(spark, sf)
      .collect()
    assert(rows.length == 20)
    val ol = T.load(spark, sf, "lineitem")
      .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
      .distinct()
    val edges = ol.toDF("o", "a")
      .join(ol.toDF("o2", "b"),
        F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
      .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
      .filter(F.col("nab") >= 2)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b && !edges.contains((a, b)))
      assert(r.getLong(2) >= 1 && r.getDouble(3) > 0.0)
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("q288: largest-remainder allocation spends the budget exactly") {
    val rows = TrainQueries.queries("q288_epoch_alloc")(spark, sf)
      .collect()
    assert(rows.length == 20) // 20 sources
    assert(rows.map(_.getLong(3)).sum == 100000L)
    rows.foreach { r =>
      val (quota, alloc) = (r.getDouble(2), r.getLong(3))
      // Hamilton: every source gets floor(quota) or floor(quota) + 1
      assert(alloc == math.floor(quota).toLong
        || alloc == math.floor(quota).toLong + 1)
    }
  }

  test("q289: w_plus matches a driver-side exact signed-rank") {
    val row = TrainQueries.queries("q289_wilcoxon")(spark, sf)
      .collect()(0)
    val (n, wPlus) = (row.getLong(0), row.getDouble(1))
    // independent reimplementation on collected per-user cent sums
    val per = T.load(spark, sf, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.col("user_id"),
        F.when(F.col("event_type") === "click", 1L).otherwise(0L)
          .as("g"),
        F.expr("cast(round(value * 100, 0) as bigint)").as("cents"))
      .collect().groupBy(_.getLong(0)).values.flatMap { evs =>
        val (c, p) = evs.partition(_.getLong(1) == 1L)
        if (c.isEmpty || p.isEmpty) None
        else {
          val d = BigDecimal(c.map(_.getLong(2)).sum.toDouble / c.length
            - p.map(_.getLong(2)).sum.toDouble / p.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (d == 0.0) None else Some(d)
        }
      }.toArray
    assert(per.length == n)
    val sorted = per.map(d => (math.abs(d), d > 0)).sortBy(_._1)
    var (i, w) = (0, 0.0)
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val r = (i + 1 + j) / 2.0
      (i until j).foreach(ix => if (sorted(ix)._2) w += r)
      i = j
    }
    assert(math.abs(wPlus - w) < 1e-6)
    assert(row.getBoolean(3) == (math.abs(row.getDouble(2)) > 1.959964))
  }

  test("q290: both voting rounds cover every annotated item once") {
    val rows = TrainQueries.queries("q290_label_fusion")(spark, sf)
      .collect()
    val items = T.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == items)
    assert(rows.map(_.getLong(2)).sum == items)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(1)))
  }

  test("q291: k is the conformal index and coverage is near-nominal") {
    val row = TrainQueries.queries("q291_conformal")(spark, sf)
      .collect()(0)
    val (nCal, k) = (row.getLong(0), row.getLong(1))
    assert(k == (9 * (nCal + 1) + 9) / 10) // ceil(0.9 (n+1))
    assert(row.getDouble(2) >= 0.0)
    val cov = row.getDouble(4)
    // split-conformal guarantee: >= 0.9 in expectation; finite-sample
    // slack on the small corpus
    assert(cov >= 0.85 && cov <= 1.0)
  }

  test("q292: merge application shrinks the symbol stream correctly") {
    val row = TrainQueries.queries("q292_bpe_apply")(spark, sf)
      .collect()(0)
    val (words, before, after) =
      (row.getLong(1), row.getLong(2), row.getLong(3))
    // chars_before must equal the raw corpus token-character count
    val toks = T.load(spark, sf, "documents")
      .select(F.explode(graft.plans.TextExpressions
        .wordTokens(F.col("text"))).as("w"))
    assert(before == toks.agg(F.sum(F.length(F.col("w"))))
      .collect()(0).getLong(0))
    assert(words == toks.distinct().count())
    assert(after < before) // 4 merges must save something
    assert(math.abs(row.getDouble(4) - after.toDouble / before) < 1e-5)
  }

  test("q313: per-doc tokenization reconciles with q292's corpus totals") {
    val rows = TrainQueries.queries("q313_bpe_corpus")(spark, sf)
      .collect()
    // every doc with at least one token appears exactly once
    val toks = T.load(spark, sf, "documents")
      .select(F.col("doc_id"), F.explode(graft.plans.TextExpressions
        .wordTokens(F.col("text"))).as("w"))
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.length == toks.select("doc_id").distinct().count())
    // per-doc sums roll up to q292's corpus-level totals: Σ n_chars =
    // chars_before, Σ n_tokens = symbols_after (same merge table)
    val q292 = TrainQueries.queries("q292_bpe_apply")(spark, sf)
      .collect()(0)
    assert(rows.map(_.getLong(3)).sum == q292.getLong(2))
    assert(rows.map(_.getLong(2)).sum == q292.getLong(3))
    // merging never inflates: chars >= tokens >= words, per doc
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(2) >= r.getLong(1))
      assert(math.abs(r.getDouble(4)
        - r.getLong(2).toDouble / r.getLong(3)) < 1e-5)
    }
  }

  test("q293: sweep curve is monotone in the threshold") {
    val rows = TrainQueries.queries("q293_filter_sweep")(spark, sf)
      .orderBy("t").collect()
    assert(rows.length == 7)
    val total = T.load(spark, sf, "documents").count()
    val kept = rows.map(_.getLong(1))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    val chars = rows.map(_.getLong(2))
    assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(
      math.abs(r.getDouble(3) - r.getLong(1).toDouble / total) < 1e-6))
  }

  test("q294: PQ trains 4 subspace codebooks deterministically") {
    def run() = TrainQueries.queries("q294_pq")(spark, sf)
      .orderBy("subspace").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val a = run()
    assert(a.length == 4)
    val nVecs = T.load(spark, sf, "embeddings").count()
    a.foreach { case (sub, n, codes, mse) =>
      assert(sub >= 0 && sub <= 3)
      assert(n == nVecs)
      assert(codes >= 1 && codes <= 4)
      assert(mse >= 0.0)
    }
    // the float-sensitive path (Lloyd argmin + 8-dp state) must be
    // run-to-run deterministic — that is what the oracle gate relies on
    assert(a.toSeq == run().toSeq)
  }

  test("q295: oov partition is exhaustive and rates are exact ratios") {
    val rows = TrainQueries.queries("q295_oov_rate")(spark, sf)
      .collect()
    val total = T.load(spark, sf, "documents")
      .select(F.explode(graft.plans.TextExpressions
        .wordTokens(F.col("text"))).as("w")).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3)
        - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("q296: exact KS statistic matches a driver-side sup|F1-F2|") {
    val row = TrainQueries.queries("q296_ks_exact")(spark, sf)
      .collect()(0)
    val vals = T.load(spark, sf, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "click", r.getDouble(1)))
    val (a, b) = vals.partition(_._1)
    val (n1, n2) = (a.length, b.length)
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    val xs = vals.map(_._2).distinct.sorted
    val d = xs.map { x =>
      math.abs(a.count(_._2 <= x).toDouble / n1
        - b.count(_._2 <= x).toDouble / n2)
    }.max
    assert(math.abs(row.getDouble(2) - d) < 1e-5)
    assert(row.getBoolean(4) == (row.getDouble(2) > row.getDouble(3)))
  }

  test("q297: per-segment AUC is a probability and covers all events") {
    val rows = TrainQueries.queries("q297_group_auc")(spark, sf)
      .collect()
    val segs = T.load(spark, sf, "events")
      .join(T.load(spark, sf, "customer"),
        F.col("user_id") === F.col("c_custkey"))
      .select("c_mktsegment").distinct().count()
    assert(rows.length == segs)
    val joined = T.load(spark, sf, "events")
      .join(T.load(spark, sf, "customer"),
        F.col("user_id") === F.col("c_custkey")).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == joined)
    rows.foreach(r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("q298: ndcg in [0,1] with positive relevance support") {
    val rows = TrainQueries.queries("q298_ndcg")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("q347: graded ndcg in [0,1]; binary-degenerate case equals q298") {
    val rows = TrainQueries.queries("q347_ndcg_graded")(spark, sf)
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0) // n2, n1
      assert(r.getDouble(3) >= 0.0) // dcg
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9,
        s"ndcg out of range: ${r.getDouble(4)}")
    }
    // a perfect first page (10 same-label hits at ranks 1-10 with
    // n2 >= 10) would make ndcg exactly 1; at minimum SOME query must
    // have graded support for the metric to be non-vacuous
    assert(rows.exists(r => r.getLong(1) + r.getLong(2) > 0))
  }

  test("q347 normalizer: n2=0 with n1>0 yields a positive finite ndcg") {
    // The sf data never produces a query with zero same-label docs but
    // some adjacent-label docs, so pin the guard directly: Spark's
    // sequence(1, 0) is DESCENDING [1, 0] and its r=0 term divides by
    // log2(1) = 0 — without the n2 > 0 guard this shape gets
    // IDCG = Infinity and ndcg silently 0, diverging from DuckDB's
    // empty range(1, 1). IDCG here must be the grade-1 fold alone.
    import spark.implicits._
    val shapes = Seq(
      (1.5, 0L, 3L),   // the hazard shape: grade-1 support only
      (0.0, 0L, 0L),   // no graded support at all -> defined 0
      (3.0, 2L, 0L),   // grade-2 support only
      (4.0, 2L, 3L))   // both grades
      .toDF("dcg", "n2", "n1")
    val got = shapes
      .select(F.col("n2"), F.col("n1"),
        F.expr(TrainQueries.gradedNdcgExpr).as("ndcg"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    def idcg(n2: Long, n1: Long): Double = {
      val g2 = (1L to math.min(n2, 10L)).map(r => 3.0 / (math.log(r + 1.0) / math.log(2.0))).sum
      val g1 = if (n2 < 10 && n1 > 0)
        ((n2 + 1) to math.min(n2 + n1, 10L)).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
      else 0.0
      g2 + g1
    }
    def exp(dcg: Double, n2: Long, n1: Long): Double =
      if (n2 + n1 == 0) 0.0
      else BigDecimal(dcg / idcg(n2, n1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((0L, 3L)) == exp(1.5, 0L, 3L) && got((0L, 3L)) > 0.0)
    assert(got((0L, 0L)) == 0.0)
    assert(got((2L, 0L)) == exp(3.0, 2L, 0L))
    assert(got((2L, 3L)) == exp(4.0, 2L, 3L))
  }

  test("q348: recall@10 in [0,1] and hits bounded by both k and n_rel") {
    val rows = TrainQueries.queries("q348_recall_at_k")(spark, sf)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (hits, nRel, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 10 && hits <= nRel)
      assert(rec >= 0.0 && rec <= 1.0 + 1e-9)
      // tie-safe normalization: full page ⇒ recall 1 exactly
      if (hits == math.min(nRel, 10L)) assert(rec == 1.0)
    }
  }

  test("q299: EMD is a [0,1] distance over every QI group") {
    val rows = TrainQueries.queries("q299_tcloseness")(spark, sf)
      .collect()
    val custs = T.load(spark, sf, "customer").count()
    assert(rows.map(_.getLong(2)).sum == custs)
    rows.foreach { r =>
      val emd = r.getDouble(3)
      assert(emd >= 0.0 && emd <= 1.0)
      assert(r.getBoolean(4) == (emd <= 0.2))
    }
  }

  test("q300: modularity matches a driver-side exact recomputation") {
    val row = TrainQueries.queries("q300_modularity")(spark, sf)
      .collect()(0)
    // rebuild the same graph + labels, compute Q directly
    val ol = T.load(spark, sf, "lineitem")
      .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
      .distinct()
    val edges = ol.toDF("o", "a")
      .join(ol.toDF("o2", "b"),
        F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
      .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
      .filter(F.col("nab") >= 2).select("a", "b")
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val comm = graft.ops.Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = e.length.toDouble
    val deg = e.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val mc = e.count(p => comm(p._1) == comm(p._2))
    val dc2 = comm.values.toSeq.distinct.map { c =>
      val d = deg.collect { case (n, d) if comm(n) == c => d }.sum
      d.toDouble * d
    }.sum
    val q = mc / m - dc2 / (4 * m * m)
    assert(row.getLong(1) == comm.size)
    assert(row.getLong(2) == e.length)
    assert(math.abs(row.getDouble(3) - q) < 1e-5)
    assert(row.getDouble(3) > -0.5 && row.getDouble(3) <= 1.0)
  }

  test("q301: DiD decomposes into its two deltas") {
    val r = TrainQueries.queries("q301_did")(spark, sf).collect()(0)
    val (td, cd, did, placebo) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(math.abs(did - (td - cd)) < 2e-6)
    assert(r.getBoolean(4) == (math.abs(placebo) <= 0.25))
  }

  test("q302: EM fit is deterministic with sane mixture parameters") {
    def run() = TrainQueries.queries("q302_em_mixture")(spark, sf)
      .collect()(0)
    val r = run()
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0) // w1
    assert(r.getDouble(3) > 0.0 && r.getDouble(5) > 0.0) // sds
    assert(r.getDouble(6) < 0.0) // avg loglik of a continuous density
    // the float-heaviest path in the suite (exp responsibilities, 5
    // params x 3 rounds of 8-dp state) must be run-to-run stable
    val r2 = run()
    (0 to 6).foreach(i => assert(r.get(i) == r2.get(i)))
  }

  test("q303: PRF marginals reconcile with the q50 confusion matrix") {
    val rows = TrainQueries.queries("q303_prf_report")(spark, sf)
      .collect()
    val docs = T.load(spark, sf, "documents").count()
    // every doc is exactly one (true, pred) cell: tp+fn sums to docs
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum == docs)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == docs)
    rows.foreach { r =>
      val (p, rec, f1) = (r.getDouble(4), r.getDouble(5),
        r.getDouble(6))
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
      assert(f1 <= math.max(p, rec) + 1e-9)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 1) // accuracy
    }
  }

  test("q304: power sizing follows the closed form") {
    val rows = TrainQueries.queries("q304_power_calc")(spark, sf)
      .collect()
    assert(rows.length == 5) // 5 event types
    rows.foreach { r =>
      val (sd, mde, nReq) = (r.getDouble(3), r.getDouble(4),
        r.getLong(5))
      assert(sd > 0 && mde > 0 && nReq > 0)
      // recompute from the published 6-dp sd/mde — within rounding
      val z = 1.959964 + 0.841621
      val expect = z * z * 2 * sd * sd / (mde * mde)
      assert(math.abs(nReq - expect) / expect < 0.01)
    }
  }

  test("q305: bloom audit counts are internally consistent") {
    val r = TrainQueries.queries("q305_bloom_fpr")(spark, sf)
      .collect()(0)
    val (nIns, bits, nProbes, nFp) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    assert(bits <= math.min(1024L, 3 * nIns)) // k probes per insert
    assert(nFp <= nProbes)
    val (fpr, theory) = (r.getDouble(4), r.getDouble(5))
    assert(fpr >= 0.0 && fpr <= 1.0 && theory >= 0.0 && theory <= 1.0)
    assert(r.getBoolean(6) == (math.abs(fpr - theory) <= 0.1))
  }

  test("q306: RBO is a [0,1] overlap consistent with the join") {
    val r = TrainQueries.queries("q306_rbo")(spark, sf).collect()(0)
    val (common, rbo) = (r.getLong(1), r.getDouble(2))
    assert(common >= 0 && common <= 50)
    assert(rbo >= 0.0 && rbo <= 1.0)
    assert((rbo > 0.0) == (common > 0))
  }

  test("q282: streamed semi-join decontam equals its batch twin") {
    val streamed = graft.queries.StreamQueries
      .queries("q282_stream_decontam")(spark, sf)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // batch twin: same shingle-hash semi join without the stream
    val src = T.load(spark, sf, "documents")
      .withColumn("__sh", F.explode(
        graft.plans.TextExpressions.wordShingles(F.col("text"), 3)))
    val corpus = src.filter(F.col("doc_id") % 97 =!= 0)
      .select(F.col("doc_id"), F.col("lang"), F.col("n_chars"),
        F.xxhash64(F.col("__sh")).as("__key"))
    val bench = src.filter(F.col("doc_id") % 97 === 0)
      .select(F.xxhash64(F.col("__sh")).as("__bkey"))
    val batch = corpus
      .join(bench, F.col("__key") === F.col("__bkey"), "left_semi")
      .select("doc_id", "lang", "n_chars").distinct()
      .groupBy("lang")
      .agg(F.count(F.lit(1)).as("n_contaminated"),
        F.sum("n_chars").as("contaminated_chars"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
