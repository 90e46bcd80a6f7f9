package graft

import org.apache.spark.sql.{functions => F}
import graft.queries.ScoreQueries

/** Closed-form and invariant checks for the wave-19/20 scoring /
  * experimentation / sharding operators — complementing the sf-oracle
  * parity gate with hand-checkable math on the smallest corpus.
  */
class ScoreSpec extends SparkSpec {
  import spark.implicits._

  test("RFM quintiles are 1..5, balanced, and monotone in the metric") {
    val out = ScoreQueries.queries("q264_rfm")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rq, fq, mq) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rq >= 1 && rq <= 5 && fq >= 1 && fq <= 5 && mq >= 1 && mq <= 5)
      assert(r.getLong(4) == rq * 100 + fq * 10 + mq)
    }
    // quintile sizes differ by at most 1 (exact global ranks)
    val sizes = rows.groupBy(_.getLong(3)).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1)
  }

  test("simpson detector: sign flip shows iff group and pooled disagree") {
    val rows = ScoreQueries.queries("q265_simpson")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flip = r.getBoolean(4)
      assert(flip == (r.getLong(2) != r.getLong(3)))
    }
  }

  test("replayable minhash: 64 wide min columns per doc, all in [0, P)") {
    val docs = T.load(spark, sf, "documents")
      .withColumn("sh", graft.plans.TextExpressions
        .wordShingles(F.col("text"), 3))
      .limit(20)
    val sig = ScoreQueries.replayableMinhash(docs, "doc_id", "sh")
    assert(sig.columns.toSeq == "id" +: (0 until 64).map(i => s"m$i"))
    sig.collect().foreach { r =>
      (1 to 64).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) < 2147483647L)
      }
    }
  }

  test("LSH recall audit: buckets in 5..9, recall in [0,1], caught<=pairs") {
    val rows = ScoreQueries.queries("q266_lsh_recall")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 5 && r.getLong(0) <= 9)
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      // banding theory: at j >= 0.9, miss prob (1-j^4)^16 < 0.4% — on
      // this corpus's 0.9+ pairs the audit must read recall 1
      if (r.getLong(0) == 9) assert(r.getDouble(3) == 1.0)
    }
  }

  test("decile lift: capture is monotone and ends at 1.0") {
    val rows = ScoreQueries.queries("q267_decile_lift")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    val caps = rows.map(_.getDouble(4))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-9)
  }

  test("covariate balance: SMD formula on a hand-built frame") {
    val rows = ScoreQueries.queries("q268_covariate_balance")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("n_events", "active_days", "value_cents"))
    rows.foreach { r =>
      assert(r.getBoolean(4) == (math.abs(r.getDouble(3)) <= 0.1))
    }
  }

  test("consistent ring: fewer moves than mod, ring is collision-free") {
    // ring positions must be distinct or successor picks are ill-defined
    val ra = ScoreQueries.ring(10, 16)
    assert(ra.map(_._1).distinct.size == ra.size)
    assert(ra == ra.sortBy(_._1))
    val rows = ScoreQueries.queries("q269_ring_rebalance")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("ring") < rows("mod"))
    assert(rows("ring") < 0.3) // ~2/10 of the ring belongs to new shards
  }

  test("PSI drift: psi >= 0 up to rounding, smoothing keeps it finite") {
    val rows = ScoreQueries.queries("q270_psi_drift")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("hour", "dow", "event_type"))
    rows.foreach { r =>
      val psi = r.getDouble(2)
      assert(!psi.isNaN && !psi.isInfinite)
      assert(psi >= -1e-9) // PSI is a sum of (p-q)ln(p/q) >= 0 terms
      assert(r.getBoolean(3) == (psi > 0.2))
    }
  }

  test("horizon labels match a brute-force per-user scan") {
    val out = ScoreQueries.queries("q271_horizon_labels")(spark, sf)
    val e = T.load(spark, sf, "events")
      .select(F.col("event_id"), F.col("user_id"),
        F.expr("cast(floor(unix_timestamp(ts)) as bigint)").as("tsec"),
        F.col("event_type"))
    val p = e.filter(F.col("event_type") === "purchase")
      .select(F.col("user_id"), F.col("tsec").as("pts")).distinct()
    val brute = e.filter(F.col("event_type") =!= "purchase")
      .join(p, Seq("user_id"), "left")
      .groupBy("event_id")
      .agg(F.max(F.col("pts") >= F.col("tsec") &&
        F.col("pts") - F.col("tsec") <= 604800L).as("blabel"))
      .withColumn("blabel", F.coalesce(F.col("blabel"), F.lit(false)))
    val diff = out.join(brute, "event_id")
      .filter(F.col("label") =!= F.col("blabel")).count()
    assert(diff == 0)
    assert(out.count() == e.filter(F.col("event_type") =!= "purchase").count())
  }

  test("degree assortativity is a correlation: |r| <= 1") {
    val r = ScoreQueries.queries("q272_degree_assort")(spark, sf)
      .collect()(0)
    assert(r.getLong(0) > 0)
    assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("dp noise: bounded Laplace shift, deterministic across runs") {
    val a = ScoreQueries.queries("q274_dp_noise")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val b = ScoreQueries.queries("q274_dp_noise")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(a == b) // hash-seeded inverse-CDF noise is reproducible
    // Laplace(2.0) noise at u in [1/1000005, 1-1/1000005]: |noise| is
    // bounded by 2·ln(1000005/2) ≈ 26.3
    a.values.foreach(v => assert(v > -30 && v < 1e7))
  }

  test("dedup savings: keep-one accounting is self-consistent") {
    val rows = ScoreQueries.queries("q275_dedup_savings")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (sz, nc, removed, saved) =>
      assert(removed == (sz - 1) * nc) // keep-one removes sz-1 per cluster
      if (sz == 1) assert(removed == 0 && saved == 0)
      else assert(saved > 0)
    }
    // every doc lands in exactly one cluster
    val totalDocs = rows.map { case (sz, nc, _, _) => sz * nc }.sum
    assert(totalDocs == T.load(spark, sf, "documents").count())
  }

  test("lang rebalance: shares sum to 1, weights invert the mix") {
    val rows = ScoreQueries.queries("q276_lang_rebalance")(spark, sf)
      .collect()
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    rows.foreach { r =>
      // weight * actual_share == uniform target (up to rounding)
      assert(math.abs(r.getDouble(4) * r.getDouble(3) -
        1.0 / rows.length) < 1e-4)
    }
  }

  test("funnel wilson: interval brackets p and stays inside [0,1]") {
    val rows = ScoreQueries.queries("q277_funnel_wilson")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("view_to_click", "click_to_purchase"))
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= p && p <= hi)
      assert(lo >= 0.0 && hi <= 1.0)
      assert(r.getLong(1) <= r.getLong(2)) // x <= n
    }
  }

  test("ann recall: full agreement when brute top-1 is in the probed cell") {
    val rows = ScoreQueries.queries("q278_ann_recall")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, mrr) = (r.getDouble(1), r.getDouble(2))
      assert(rec >= 0.0 && rec <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      // IVF results are a subset of the corpus: recall 1.0 forces the
      // true top-1 into the list, so mrr > 0
      if (rec == 1.0) assert(mrr > 0.0)
    }
  }

  test("mixture descent: weights normalize and move against char load") {
    val rows = ScoreQueries.queries("q279_mixture_descent")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4) // weights sum to 1
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4) // loads sum to 1
    // exponentiated gradient downweights big domains: weight order is
    // the REVERSE of char order
    val byChars = rows.sortBy(_._2).map(_._3)
    assert(byChars.zip(byChars.tail).forall { case (a, b) => a >= b })
    // the step direction is toward balance: load spread after 5 rounds
    // is strictly tighter than the raw char-share spread
    val n = rows.length
    val rawShares = rows.map(_._2.toDouble / rows.map(_._2).sum)
    def spread(xs: Seq[Double]) = xs.max - xs.min
    assert(spread(rows.map(_._4).toSeq) < spread(rawShares.toSeq) + 1e-12)
  }

  test("stream quantile sketch reconciles against the exact batch median") {
    val rows = SparkEntry.queries("q280_stream_quantile")(spark, sf)
      .collect()
    assert(rows.length == 5) // one per event type
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      assert(r.getBoolean(2)) // sketch within ±5% of exact
    }
  }

  test("SPRT monitor: cum_llr telescopes and decisions match bounds") {
    val rows = ScoreQueries.queries("q273_sprt_monitor")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    val bound = math.log(19.0)
    var prev = 0.0
    rows.foreach { r =>
      val (x, n, cum) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(x >= 0 && x <= n)
      val llr = x * math.log(0.22 / 0.18) +
        (n - x) * math.log((1.0 - 0.22) / (1.0 - 0.18))
      assert(math.abs(cum - (prev + llr)) < 1e-5)
      prev = cum
      val want = if (cum >= bound) "accept_h1"
        else if (cum <= -bound) "accept_h0" else "continue"
      assert(r.getString(4) == want)
    }
  }
}
