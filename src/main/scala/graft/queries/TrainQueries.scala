package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.T
import graft.ops.RelOps
import graft.ops.RelOps.Ordering
import graft.plans.TextExpressions
import org.apache.spark.sql.GraftReleaseBridge

/** Wave-23+ tokenizer-training / corpus-governance operators.
  *
  * Extends the reference's operator-at-a-time fold-over-materialized-
  * state spirit (/root/reference/src/grouping.jl) to the iterative
  * jobs a training-data pipeline actually runs: multi-merge BPE
  * training (q281 — the k-round extension of q258's single argmax).
  *
  * Float policy: everything here is integer-exact (pair counts,
  * character counts), so engine and oracle are bit-identical with no
  * rounding care.
  */
object TrainQueries {

  private val duckToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')"

  private val duckShingles3 =
    "list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])"

  /** Number of BPE merges q281 learns. Unrolled in the oracle, so the
    * two constants must move together. */
  private[graft] val BpeMerges = 4

  /** q347's graded-nDCG normalizer over (dcg, n2, n1). Both aggregate
    * folds are guarded (n2 > 0 / n1 > 0): Spark's `sequence(1, 0)` is
    * the DESCENDING [1, 0], whose r = 0 term divides by log2(1) = 0 —
    * an unguarded n2 = 0 query with adjacent-label support would get
    * IDCG = Infinity and a silent ndcg = 0 while the oracle's empty
    * `range(1, 1)` keeps only the grade-1 terms. Shared with TrainSpec
    * so the test exercises the exact production expression. */
  private[graft] val gradedNdcgExpr: String =
    """floor((case when n2 + n1 = 0 then cast(0 as double)
            else dcg / (
              case when n2 > 0 then
                aggregate(transform(
                    sequence(1, cast(least(n2, 10) as int)),
                    r -> 3 / log2(cast(r + 1 as double))),
                  cast(0 as double), (a, v) -> a + v)
                else cast(0 as double) end
              + case when n2 < 10 and n1 > 0 then
                  aggregate(transform(
                      sequence(cast(n2 + 1 as int),
                        cast(least(n2 + n1, 10) as int)),
                      r -> 1 / log2(cast(r + 1 as double))),
                    cast(0 as double), (a, v) -> a + v)
                else cast(0 as double) end) end) * 1e6 + 0.5) / 1e6"""

  /** One BPE pair-count round over the paren-wrapped vocabulary:
    * (pa, pb, n) weighted by word count. The wrap `(l)(o)(w)` makes
    * token boundaries explicit, so `replace(rep, '(a)(b)', '(ab)')`
    * is EXACT greedy left-to-right merging — unlike space-delimited
    * reps, no delimiter is shared between adjacent matches, so even
    * an `(a)(a)(a)(a)` run merges to `(aa)(aa)` (verified; the
    * space-delimited form gets this wrong). Pair extraction is a
    * per-word array transform over the COMPACT (rep, count) vocab —
    * scan-parallel, never touches the corpus again. */
  private[graft] def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(F.col("c"), F.expr(
        "split(substring(rep, 2, length(rep) - 2), '[)][(]')").as("sarr"))
      .filter(F.size(F.col("sarr")) >= 2)
      .select(F.col("c"), F.explode(F.expr(
        """transform(sequence(1, size(sarr) - 1),
             i -> struct(element_at(sarr, i) as pa,
                         element_at(sarr, i + 1) as pb))""")).as("p"))
      .groupBy(F.col("p.pa").as("pa"), F.col("p.pb").as("pb"))
      .agg(F.sum("c").cast("long").as("n"))

  /** The k-round BPE training loop shared by q281 (reads the merge
    * table) and q292 (reads the post-merge vocabulary): (rank, pa,
    * pb, count) merges plus the final (rep, c) vocab — pinned; the
    * CALLER unpersists it. */
  private def bpeTrain(s: SparkSession, dir: String)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var vocab = T.load(s, dir, "documents")
      .select(F.explode(TextExpressions.wordTokens(F.col("text")))
        .as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("c"))
      // wrap every char: "low" -> "(l)(o)(w)"; tokens are [a-z0-9]+
      // so '(' / ')' never occur inside a symbol
      .select(F.regexp_replace(F.col("w"), "(.)", "($1)").as("rep"),
        F.col("c"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to BpeMerges) {
      val best = bpePairCounts(vocab)
        .orderBy(F.col("n").desc, F.col("pa").asc, F.col("pb").asc)
        .limit(1).collect()(0) // bounded: exactly one argmax row
      val (pa, pb) = (best.getString(0), best.getString(1))
      merges += ((r.toLong, pa, pb, best.getLong(2)))
      val prev = vocab
      vocab = vocab.select(
        F.expr(s"replace(rep, '($pa)($pb)', '($pa$pb)')").as("rep"),
        F.col("c")).localCheckpoint()
      GraftReleaseBridge.release(prev)
    }
    (merges.result(), vocab)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multi-merge BPE training (Sennrich et al. 2016), k = 4 rounds:
    // q258 computes ONE argmax pair; a real tokenizer trainer applies
    // that merge to the vocabulary, recounts, and repeats. Iteration
    // state is the compact (rep, count) word vocabulary — pinned
    // (localCheckpoint) each round and released (q231/Graph
    // discipline), so round r+1 never re-derives rounds 1..r from the
    // corpus. The per-round argmax is a ONE-row bounded collect
    // (MMR/k-center precedent); ties break (n desc, pa, pb) so both
    // engines pick the same merge. All counts integer-exact; the
    // oracle unrolls the k rounds as MATERIALIZED CTEs and replays
    // the same paren-wrapped replace.
    "q281_bpe_train" -> { (s, dir) =>
      import s.implicits._
      val (merges, vocab) = bpeTrain(s, dir)
      GraftReleaseBridge.release(vocab)
      merges.toDF("merge_rank", "left_sym", "right_sym", "n")
    },

    // Mann–Whitney U rank-sum test (tie-corrected normal
    // approximation): do click and purchase `value` distributions
    // differ? The nonparametric two-sample test the suite lacked
    // (q123 is Welch's t on means; q250 permutes; q112 is KS on
    // binned CDFs). Scale shape: ranks come from the per-VALUE
    // grouped relation — one partial-agg'd groupBy collapses N rows
    // to the distinct-value relation, the exclusive cumulative count
    // is `globalPrefixSum` (range partition + O(P) driver offsets,
    // never a global window), and every rank/tie moment is an EXACT
    // integer (doubled rank sums stay integral: 2·avg_rank =
    // 2·cum_before + n + 1), accumulated in DECIMAL(38) so the
    // arithmetic is bit-equal across engines and overflow-safe at
    // 100 TB (sum n³ can pass 2^63). Floats appear only in the final
    // z projection, identical op order both sides, rounded 6 dp.
    "q283_mann_whitney" -> { (s, dir) =>
      val e = T.load(s, dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("value").as("v"),
          F.when(F.col("event_type") === "click", 1L).otherwise(0L)
            .as("g"))
      val d = e.groupBy("v")
        .agg(F.count(F.lit(1)).as("n"), F.sum("g").as("n1v"))
      val c = RelOps.globalPrefixSum(d, "n", "cb", Seq(Ordering("v")))
      val sums = c.agg(
        // cast BEFORE multiplying: the per-value products are decimal
        // from the start, so nothing overflows int64 at any corpus
        // size (DuckDB reaches the same exact integers via
        // BIGINT-with-overflow-check into a HUGEINT sum)
        F.sum(F.col("n1v").cast(DecimalType(38, 0))
          * (F.lit(2L) * F.col("cb") + F.col("n") + F.lit(1L))
            .cast(DecimalType(38, 0))).as("r2"),
        F.sum(F.col("n").cast(DecimalType(38, 0))
          * F.col("n").cast(DecimalType(38, 0))
          * F.col("n").cast(DecimalType(38, 0))
          - F.col("n").cast(DecimalType(38, 0))).as("tie"))
      val cnt = e.agg(F.sum("g").as("n1"),
        (F.count(F.lit(1)) - F.sum("g")).as("n2"))
      sums.crossJoin(F.broadcast(cnt))
        .select(F.col("n1"), F.col("n2"),
          F.expr("""floor(((cast(r2 as double) - cast(n1 as double)
            * (n1 + 1)) / 2) * 1e6 + 0.5) / 1e6""").as("u1"),
          F.expr("""floor(((cast(r2 as double) - cast(n1 as double)
            * (n1 + 1) - cast(n1 as double) * n2)
            / (2 * sqrt(cast(n1 as double) * n2 / 12
              * ((n1 + n2 + 1) - cast(tie as double)
                / (cast(n1 + n2 as double) * (n1 + n2 - 1)))))) * 1e6 + 0.5) / 1e6""").as("z"))
        .withColumn("significant", F.abs(F.col("z")) > 1.959964)
    },

    // Benjamini–Hochberg FDR correction over a 25-hypothesis family
    // (per-brand discount-mean screens) — the multiple-testing step
    // every metrics platform needs between "1000 A/B readouts" and
    // "which are real". Per-brand z from EXACT hundredth-of-discount
    // integer moments; two-sided p via the shared Abramowitz–Stegun
    // 7.1.26 erf polynomial (identical formula text both engines —
    // neither ships an erf builtin in common SQL surface, so parity
    // comes from the shared approximation, not a library). The BH
    // step-up ranks 6-dp-ROUNDED p with brand tie-break (the
    // established cross-engine ordering discipline), rank =
    // `globalRowNumber`, and the rejection frontier k = max rank with
    // p ≤ rank·α/m is one scalar agg broadcast back — no global
    // window, no driver loop.
    "q284_bh_fdr" -> { (s, dir) =>
      val li = T.load(s, dir, "lineitem")
        .join(T.load(s, dir, "part"),
          F.col("l_partkey") === F.col("p_partkey"))
        .select(F.col("p_brand"),
          F.expr("cast(floor((l_discount * 100) * 1e0 + 0.5) / 1e0 as bigint)").as("d"))
      val per = li.groupBy("p_brand")
        .agg(F.count(F.lit(1)).as("n"), F.sum("d").as("sm"),
          F.sum(F.col("d") * F.col("d")).as("sq"))
      val tot = per.agg(F.sum("n").as("tn"), F.sum("sm").as("tsm"),
        F.sum("sq").as("tsq"), F.count(F.lit(1)).as("m"))
      val z = per.crossJoin(F.broadcast(tot))
        .withColumn("z", F.expr(
          """floor(((cast(sm as double) / n - cast(tsm as double) / tn)
             / sqrt(((cast(tsq as double) - cast(tsm as double) * tsm
                 / tn) / (tn - 1)) / n)) * 1e6 + 0.5) / 1e6"""))
        // two-sided p = 1 - erf(|z| / sqrt(2)), A&S 7.1.26 polynomial
        // — the SAME pFromZ fragment the oracle runs, over the SAME
        // 6-dp-rounded z, so the p values are identical doubles by
        // construction (modulo a last-ulp libm exp difference the
        // 6-dp rounding absorbs)
        .withColumn("p6", F.expr(s"floor((${pFromZ("z")}) * 1e6 + 0.5) / 1e6"))
        .select("p_brand", "n", "z", "p6", "m")
      val ranked = RelOps.globalRowNumber(z, "bh_rank",
        Seq(Ordering("p6"), Ordering("p_brand")))
      val k = ranked.agg(F.max(F.when(
        F.col("p6") <= F.col("bh_rank") * 0.05 / F.col("m"),
        F.col("bh_rank"))).as("k"))
      ranked.crossJoin(F.broadcast(k))
        .select(F.col("p_brand"), F.col("n"), F.col("z"),
          F.col("p6").as("p_value"), F.col("bh_rank"),
          (F.col("bh_rank") <= F.coalesce(F.col("k"), F.lit(0L)))
            .as("rejected"))
    },

    // Platt scaling (Platt 1999): calibrate a raw score into a
    // probability by fitting sigma(a·s + b) to binary outcomes with
    // 3 Newton iterations — the logistic-regression-shaped iterative
    // fit the suite lacked. s = l_discount (parquet doubles, bit-
    // identical both engines), y = (l_returnflag = 'R'). Each
    // iteration is ONE partial-agg'd scalar pass producing the 2-d
    // gradient + 2×2 Hessian moments (5 sums); the Newton solve is
    // closed-form driver arithmetic on that 1-row collect (bounded —
    // q279's pinned-tiny-state discipline), and (a, b) are rounded to
    // 8 dp each round so engine and oracle iterate on identical state
    // (q231/q279 rule). The data relation is pinned once; the corpus
    // is scanned exactly 3 + 1 times with no driver-side data loop.
    "q285_platt_scale" -> { (s, dir) =>
      import s.implicits._
      val d = T.load(s, dir, "lineitem")
        .select(F.col("l_discount").as("s"),
          F.when(F.col("l_returnflag") === "R", 1.0d).otherwise(0.0d)
            .as("y"))
        .localCheckpoint()
      def r8(x: Double): Double =
        BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      var (a, b) = (0.0d, 0.0d)
      for (_ <- 1 to 3) {
        val m = d.select(
            F.expr(s"1 / (1 + exp(-($a * s + $b)))").as("p"),
            F.col("s"), F.col("y"))
          .agg(F.sum(F.expr("p - y")).as("g0"),
            F.sum(F.expr("(p - y) * s")).as("g1"),
            F.sum(F.expr("p * (1 - p)")).as("h00"),
            F.sum(F.expr("p * (1 - p) * s")).as("h01"),
            F.sum(F.expr("p * (1 - p) * s * s")).as("h11"))
          .collect()(0) // bounded: one 5-moment row per iteration
        val (g0, g1) = (m.getDouble(0), m.getDouble(1))
        val (h00, h01, h11) =
          (m.getDouble(2), m.getDouble(3), m.getDouble(4))
        val det = h00 * h11 - h01 * h01
        b = r8(b - (h11 * g0 - h01 * g1) / det)
        a = r8(a - (h00 * g1 - h01 * g0) / det)
      }
      val out = d.select(
          F.expr(s"1 / (1 + exp(-($a * s + $b)))").as("p"),
          F.col("y"))
        .agg(F.count(F.lit(1)).as("n"),
          F.expr("floor((avg(-(y * ln(p) + (1 - y) * ln(1 - p)))) * 1e6 + 0.5) / 1e6")
            .as("logloss"))
        .select(F.lit(a).as("a"), F.lit(b).as("b"), F.col("n"),
          F.col("logloss"))
      out
    },

    // l-diversity audit — the attribute-disclosure companion to
    // q237's k-anonymity: a QI group can be k-large yet still leak if
    // every member shares one sensitive value. QI = (nation, segment),
    // sensitive = thousand-dollar balance band; per group l = distinct
    // sensitive values, reported as the l-distribution with the
    // at-risk (l < 3) flag. Two partial-agg'd groupBys over the
    // compact group relation — O(groups) state, one fact shuffle.
    "q286_ldiversity" -> { (s, dir) =>
      val c = T.load(s, dir, "customer")
        .select(F.col("c_nationkey"), F.col("c_mktsegment"),
          F.floor(F.col("c_acctbal") / 1000).cast("long").as("bal_band"))
      c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).as("n_cust"),
          F.count_distinct(F.col("bal_band")).as("l"))
        .groupBy("l")
        .agg(F.count(F.lit(1)).as("n_groups"),
          F.sum("n_cust").as("n_customers"))
        .withColumn("at_risk", F.col("l") < 3)
    },

    // Adamic–Adar link prediction over the co-purchase graph: score
    // non-adjacent part pairs by Σ 1/ln(deg(w)) over common neighbors
    // w — the classic "who should be linked next" recommender signal.
    // Edges are q181's thresholded basket pairs (nab ≥ 2, per-order
    // fan-out bounded by parts-per-order²); the wedge join is keyed on
    // the common neighbor with a deg ≤ 128 hub cap (hubs contribute
    // ~0 through 1/ln and their deg² wedge fan-out is THE scale
    // hazard — the cap bounds wedges at |E|·128 and is replayed
    // identically in the oracle). Existing edges leave via an
    // anti-join; top-20 ordered by 6-dp-rounded score with (a, b)
    // tie-breaks (the cross-engine TakeOrdered discipline).
    "q287_link_predict" -> { (s, dir) =>
      val ol = T.load(s, dir, "lineitem")
        .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
        .distinct()
      val pairs = ol.toDF("o", "a")
        .join(ol.toDF("o2", "b"),
          F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
        .filter(F.col("nab") >= 2)
        .select("a", "b")
        .localCheckpoint() // feeds edges, degrees, and the anti-join
      val e = pairs.select(F.col("a").as("u"), F.col("b").as("w"))
        .unionAll(pairs.select(F.col("b").as("u"), F.col("a").as("w")))
      val deg = e.groupBy("w").agg(F.count(F.lit(1)).as("deg"))
      val ew = e.join(deg, "w").filter(F.col("deg") <= 128)
      val cand = ew.select(F.col("u").as("a"), F.col("w"), F.col("deg"))
        .join(ew.select(F.col("u").as("b"), F.col("w").as("w2")),
          F.col("w") === F.col("w2") && F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.expr("floor((sum(1 / ln(cast(deg as double)))) * 1e6 + 0.5) / 1e6")
            .as("score"),
          F.count(F.lit(1)).as("n_common"))
      val out = cand
        .join(pairs, Seq("a", "b"), "left_anti")
        .orderBy(F.col("score").desc, F.col("a").asc, F.col("b").asc)
        .limit(20)
        .select("a", "b", "n_common", "score")
      out
    },

    // Largest-remainder (Hamilton) apportionment of a 100 000-sample
    // epoch budget across sources under a sqrt-count target mix — the
    // integerization step between q279's learned mixture weights and
    // an actual sampler ("3.7 epochs of source X" must become whole
    // draws). Quotas are 6-dp-rounded BEFORE floor/remainder so both
    // engines integerize the identical double (no floor knife-edge);
    // the +1 frontier is a remainder rank (`globalRowNumber`, source
    // tie-break) against the leftover count R — one scalar agg
    // broadcast back, O(sources) state.
    "q288_epoch_alloc" -> { (s, dir) =>
      val B = 100000L
      val n = T.load(s, dir, "documents")
        .groupBy("source").agg(F.count(F.lit(1)).as("n_docs"))
      val tot = n.agg(F.sum(F.expr("sqrt(cast(n_docs as double))"))
        .as("ssq"))
      val q = n.crossJoin(F.broadcast(tot))
        .withColumn("quota", F.expr(
          s"floor(($B * sqrt(cast(n_docs as double)) / ssq) * 1e6 + 0.5) / 1e6"))
        .withColumn("base",
          F.expr("cast(floor(quota) as bigint)"))
        .withColumn("rem", F.expr("floor((quota - base) * 1e6 + 0.5) / 1e6"))
      val ranked = RelOps.globalRowNumber(q, "rk",
        Seq(Ordering("rem", desc = true), Ordering("source")))
      val r = ranked.agg((F.lit(B) - F.sum("base")).as("leftover"))
      ranked.crossJoin(F.broadcast(r))
        .select(F.col("source"), F.col("n_docs"), F.col("quota"),
          (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1L)
            .otherwise(0L)).as("alloc"))
    },

    // Wilcoxon signed-rank test — the PAIRED twin of q283: per user
    // with both behaviors, does click value tend to exceed purchase
    // value? The per-user difference is computed from EXACT cent sums
    // (sc/nc − sp/np: integer-valued doubles divided — bit-identical
    // across engines, so the 6-dp rounding has no knife-edge), zeros
    // drop per the classic procedure, and |d| ranks reuse q283's
    // machinery: distinct-value groupBy + `globalPrefixSum`, doubled
    // rank sums as exact DECIMAL(38) integers, tie-corrected normal z
    // ((2W⁺ − n(n+1)/2) / (2·√((2n(n+1)(2n+1) − Σ(t³−t))/48))) as the
    // only float, identical op order both sides.
    "q289_wilcoxon" -> { (s, dir) =>
      val ev = T.load(s, dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("user_id"),
          F.when(F.col("event_type") === "click", 1L).otherwise(0L)
            .as("g"),
          F.expr("cast(floor((value * 100) * 1e0 + 0.5) / 1e0 as bigint)").as("cents"))
      val per = ev.groupBy("user_id")
        .agg(F.sum(F.when(F.col("g") === 1, F.col("cents"))).as("sc"),
          F.sum(F.col("g")).as("nc"),
          F.sum(F.when(F.col("g") === 0, F.col("cents"))).as("sp"),
          F.sum(F.lit(1L) - F.col("g")).as("np"))
        .filter(F.col("nc") > 0 && F.col("np") > 0)
        .select(F.expr(
          """floor((cast(sc as double) / nc
             - cast(sp as double) / np) * 1e6 + 0.5) / 1e6""").as("d"))
        .filter(F.col("d") =!= 0.0d)
      val dv = per
        .select(F.abs(F.col("d")).as("ad"),
          F.when(F.col("d") > 0, 1L).otherwise(0L).as("pos"))
        .groupBy("ad")
        .agg(F.count(F.lit(1)).as("n"), F.sum("pos").as("npos"))
      val c = RelOps.globalPrefixSum(dv, "n", "cb", Seq(Ordering("ad")))
      c.agg(
          F.sum(F.col("npos").cast(DecimalType(38, 0))
            * (F.lit(2L) * F.col("cb") + F.col("n") + F.lit(1L))
              .cast(DecimalType(38, 0))).as("w2"),
          F.sum(F.col("n").cast(DecimalType(38, 0))
            * F.col("n").cast(DecimalType(38, 0))
            * F.col("n").cast(DecimalType(38, 0))
            - F.col("n").cast(DecimalType(38, 0))).as("tie"),
          F.sum("n").as("n"))
        .select(F.col("n").as("n_pairs"),
          F.expr("floor((cast(w2 as double) / 2) * 1e6 + 0.5) / 1e6").as("w_plus"),
          F.expr("""floor(((cast(w2 as double) - cast(n as double)
              * (n + 1) / 2)
            / (2 * sqrt((2 * cast(n as double) * (n + 1) * (2 * n + 1)
              - cast(tie as double)) / 48))) * 1e6 + 0.5) / 1e6""").as("z"))
        .withColumn("significant", F.abs(F.col("z")) > 1.959964)
    },

    // Reliability-weighted label fusion — the crowd-labeling
    // aggregation step (one Dawid–Skene-flavored reweighting round):
    // suppliers "annotate" parts with a return flag; round 1 is plain
    // majority vote, round 2 weights each annotator by its
    // round-1 agreement rate and re-votes. Every argmax is
    // deterministic: votes and micro-reliabilities (rounded to 1e-6
    // INTEGERS, so weighted tallies are exact integer sums — no float
    // argmax knife-edge) break ties by label. Scale shape: per-item
    // windows are bounded by the 3-label domain; reliabilities are
    // one keyed join + partial agg; the fact table shuffles twice.
    "q290_label_fusion" -> { (s, dir) =>
      val ann = T.load(s, dir, "lineitem")
        .select(F.col("l_partkey").as("item"),
          F.col("l_suppkey").as("ann"),
          F.col("l_returnflag").as("lbl"))
      val w1 = Window.partitionBy("item")
        .orderBy(F.col("cnt").desc, F.col("lbl").asc)
      val maj = ann.groupBy("item", "lbl")
        .agg(F.count(F.lit(1)).as("cnt"))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") === 1)
        .select(F.col("item"), F.col("lbl").as("maj"))
        .localCheckpoint() // feeds reliability AND the round-2 vote
      val rel = ann.join(maj, "item")
        .groupBy("ann")
        .agg(F.expr(
          """cast(floor((1000000 * sum(case when lbl = maj then 1
               else 0 end) / count(*)) * 1e0 + 0.5) / 1e0 as bigint)""").as("rel"))
      val w2 = Window.partitionBy("item")
        .orderBy(F.col("wt").desc, F.col("lbl").asc)
      val fused = ann.join(rel, "ann")
        .groupBy("item", "lbl")
        .agg(F.sum("rel").as("wt"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") === 1)
        .select(F.col("item"), F.col("lbl").as("fused"))
      val out = maj.join(fused, "item")
        .groupBy(F.col("maj").as("label"))
        .agg(F.count(F.lit(1)).as("n_majority"),
          F.sum(F.when(F.col("fused") === F.col("maj"), 0L)
            .otherwise(1L)).as("n_flipped"))
      val r2 = fused.groupBy(F.col("fused").as("label"))
        .agg(F.count(F.lit(1)).as("n_weighted"))
      val res = out.join(r2, Seq("label"), "full_outer")
        .select(F.col("label"),
          F.coalesce(F.col("n_majority"), F.lit(0L)).as("n_majority"),
          F.coalesce(F.col("n_weighted"), F.lit(0L)).as("n_weighted"),
          F.coalesce(F.col("n_flipped"), F.lit(0L)).as("n_flipped"))
      res
    },

    // Split-conformal calibration (Vovk; Angelopoulos–Bates 2021):
    // the distribution-free prediction-interval radius q̂ = the
    // ⌈(n+1)(1−α)⌉-th smallest calibration nonconformity score, plus
    // the test-side coverage audit — the modern ML-eval op between
    // "point prediction" and "trustworthy interval". Everything
    // deterministic: scores are |cents − type mean| with the mean an
    // exact-int division (bit-identical doubles), the rank index k is
    // pure integer arithmetic (⌈9(n+1)/10⌉ via div), the k-th order
    // statistic comes from `globalRowNumber` (range partition + O(P)
    // offsets, no global window), and coverage is an exact rational.
    "q291_conformal" -> { (s, dir) =>
      val ev = T.load(s, dir, "events")
        .select(F.col("event_id"), F.col("user_id"),
          F.col("event_type"),
          F.expr("cast(floor((value * 100) * 1e0 + 0.5) / 1e0 as bigint)").as("cents"))
      val mu = ev.groupBy("event_type")
        .agg(F.sum("cents").as("sm"), F.count(F.lit(1)).as("nt"))
      val scored = ev.join(F.broadcast(mu), "event_type")
        .select(F.col("event_id"), F.col("user_id"),
          F.expr("floor((abs(cents - cast(sm as double) / nt)) * 1e6 + 0.5) / 1e6")
            .as("s"))
      val cal = scored.filter(F.col("user_id") % 2 === 0)
      val ranked = RelOps.globalRowNumber(cal, "rk",
        Seq(Ordering("s"), Ordering("event_id")))
      val ncal = cal.agg(F.count(F.lit(1)).as("n_cal"))
      // k = ceil(0.9 * (n_cal + 1)) in pure integer arithmetic
      val k = ncal.select(F.col("n_cal"),
        F.expr("(9 * (n_cal + 1) + 9) div 10").as("k"))
      val qhat = ranked.join(F.broadcast(k), F.col("rk") === F.col("k"))
        .select(F.col("n_cal"), F.col("k"), F.col("s").as("qhat"))
      scored.filter(F.col("user_id") % 2 =!= 0)
        .crossJoin(F.broadcast(qhat))
        .agg(F.first("n_cal").as("n_cal"), F.first("k").as("k"),
          F.first("qhat").as("qhat"),
          F.count(F.lit(1)).as("n_test"),
          F.expr("""floor((sum(case when s <= qhat then 1 else 0 end)
            / cast(count(1) as double)) * 1e6 + 0.5) / 1e6""").as("coverage"))
        .withColumn("covered_ok", F.col("coverage") >= 0.88)
    },

    // Apply the q281-learned merges back to the corpus — the
    // tokenizer-side half of BPE training: how much does the symbol
    // stream shrink after k merges? Reuses the shared training loop
    // (same pinned-vocab rounds), then ONE weighted symbol count over
    // the final vocabulary: corpus symbols = Σ c · |rep| — compare to
    // the pre-merge character count for the compression ratio a
    // tokenizer-budget planner reads. Integer-exact except the final
    // 6-dp ratio.
    "q292_bpe_apply" -> { (s, dir) =>
      val (merges, vocab) = bpeTrain(s, dir)
      val out = vocab
        .select(F.col("c"),
          F.expr(
            "size(split(substring(rep, 2, length(rep) - 2), '[)][(]'))")
            .cast("long").as("len"),
          F.expr("length(replace(replace(rep, '(', ''), ')', ''))")
            .cast("long").as("wlen"))
        .agg(F.count(F.lit(1)).as("vocab_words"),
          F.sum(F.expr("c * len")).as("symbols_after"),
          F.sum(F.expr("c * wlen")).as("chars_before"))
        .select(F.lit(merges.size.toLong).as("n_merges"),
          F.col("vocab_words"), F.col("chars_before"),
          F.col("symbols_after"),
          F.expr("""floor((cast(symbols_after as double)
            / chars_before) * 1e6 + 0.5) / 1e6""").as("compression"))
      out
    },

    // Corpus-level BPE tokenization (r7 verdict task 5 — closes the
    // tokenizer loop): q281 trains the merge list, q292 applies it to
    // the VOCABULARY; this applies it to the CORPUS and emits per-doc
    // (n_words, n_tokens, n_chars, compression) — the numbers a
    // packing planner (q57/q228) actually consumes. The trick that
    // keeps it one corpus pass: BPE merging is a pure function of the
    // word, so the post-merge vocab IS the word→token-count map —
    // strip the parens back off `rep` to recover the word, count its
    // segments, and join the exploded corpus against that compact
    // relation (no broadcast hint — vocab size is corpus-dependent,
    // AQE decides). The corpus is read once; the vocab work is q292's.
    // Oracle: q292's unrolled merge replay, joined back to the per-doc
    // word explosion. All counts integer-exact; compression =
    // tokens/chars (q292's orientation), 6 dp.
    "q313_bpe_corpus" -> { (s, dir) =>
      val (_, vocab) = bpeTrain(s, dir)
      val wmap = vocab.select(
        F.expr("replace(replace(rep, '(', ''), ')', '')").as("w"),
        F.expr(
          "size(split(substring(rep, 2, length(rep) - 2), '[)][(]'))")
          .cast("long").as("n_sub"))
      T.load(s, dir, "documents")
        .select(F.col("doc_id"),
          F.explode(TextExpressions.wordTokens(F.col("text"))).as("w"))
        .join(wmap, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_words"),
          F.sum("n_sub").as("n_tokens"),
          F.sum(F.length(F.col("w")).cast("long")).as("n_chars"))
        .select(F.col("doc_id"), F.col("n_words"), F.col("n_tokens"),
          F.col("n_chars"),
          F.expr("floor((cast(n_tokens as double) / n_chars) * 1e6 + 0.5) / 1e6")
            .as("compression"))
    },

    // Quality-filter operating curve — the report a curation team
    // reads BEFORE picking a threshold: for a grid of cut points on a
    // per-doc quality score (tokens per 100 chars — exact-int
    // division, bit-identical across engines), how many docs and
    // chars survive? One exploded pass (docs × 7 thresholds — the
    // q270 bounded fan-out shape) into a partial-agg'd groupBy;
    // O(grid) output state.
    "q293_filter_sweep" -> { (s, dir) =>
      val d = T.load(s, dir, "documents")
        .select(F.col("n_chars"),
          F.expr("size(filter(split(lower(text), '[^a-z0-9]+'), "
            + "x -> x != ''))").cast("long").as("n_toks"))
        .select(F.col("n_chars"), F.col("n_toks"),
          F.expr("floor((100 * cast(n_toks as double) / n_chars) * 1e6 + 0.5) / 1e6")
            .as("score"))
      d.select(F.col("n_chars"), F.col("n_toks"), F.col("score"),
          F.explode(F.expr("sequence(10, 22, 2)")).as("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.when(F.col("score") >= F.col("t") / 100.0, 1L)
            .otherwise(0L)).as("n_kept"),
          F.sum(F.when(F.col("score") >= F.col("t") / 100.0,
            F.col("n_chars")).otherwise(0L)).as("chars_kept"))
        .select(F.col("t").cast("long").as("t"), F.col("n_kept"),
          F.col("chars_kept"),
          F.expr("floor((cast(n_kept as double) / n_docs) * 1e6 + 0.5) / 1e6")
            .as("frac_kept"))
    },

    // Product quantization (Jégou et al. 2011) — THE memory-bound ANN
    // compression standard: split the 64-dim embedding into 4
    // 16-dim subspaces, train a 4-code Lloyd codebook per subspace
    // (2 rounds), and report per-subspace reconstruction error.
    // Deterministic end-to-end: seeds are the 4 vectors with the
    // smallest portable Knuth-mod hash (q109 arithmetic — replayable
    // in SQL, unlike xxhash64; vec_id reduced mod the Mersenne prime
    // BEFORE the multiply so every intermediate stays below 2^63 —
    // raw vec_id·2654435761 wraps int64 above ~3.47e9 ids, silently
    // in Spark, as an error in DuckDB) taken with ONE global
    // TakeOrdered and
    // sliced per subspace; per-round centroids are 8-dp-rounded state
    // (q279 discipline) so both engines assign against identical
    // doubles; per-row distances are fixed-order folds (no
    // aggregation-order float drift); argmin ties break by code. All
    // four subspaces train in ONE loop over rounds: the exploded
    // (vec, subspace) relation is pinned once, each round is a
    // broadcast-centroid projection + one partial-agg'd (s, code,
    // dim) average — the corpus never shuffles.
    "q294_pq" -> { (s, dir) =>
      val nSub = 4; val dims = 16; val k = 4; val rounds = 2
      val base = T.load(s, dir, "embeddings")
        .select(F.col("vec_id"), F.explode(F.expr(
          s"""transform(sequence(0, ${nSub - 1}), s -> struct(s as s,
              transform(slice(embedding, s * $dims + 1, $dims),
                x -> cast(x as double)) as x))""")).as("p"))
        .select(F.col("vec_id"), F.col("p.s").as("s"),
          F.col("p.x").as("x"))
        .localCheckpoint() // consumed by every round + the final MSE
      val seeds = RelOps.globalRowNumber(
        T.load(s, dir, "embeddings")
          .orderBy(F.expr("((vec_id % 2147483647) * 2654435761) % 4294967296").asc,
            F.col("vec_id").asc)
          .limit(k), // TakeOrderedAndProject: k rows
        "rn", Seq(
          Ordering("vec_id",
            by = Some("((vec_id % 2147483647) * 2654435761) % 4294967296")),
          Ordering("vec_id")))
        .withColumn("code", F.col("rn") - 1)
        .select(F.explode(F.expr(
          s"""transform(sequence(0, ${nSub - 1}), s -> struct(s as s,
              transform(slice(embedding, s * $dims + 1, $dims),
                x -> floor((cast(x as double)) * 1e8 + 0.5) / 1e8) as c))""")).as("p"),
          F.col("code"))
        .select(F.col("p.s").as("s"), F.col("code"),
          F.col("p.c").as("c"))
      def assign(cents: DataFrame): DataFrame =
        base.join(F.broadcast(cents), "s")
          .withColumn("dist", F.expr(
            "aggregate(zip_with(x, c, (a, b) -> (a - b) * (a - b)), "
              + "cast(0 as double), (acc, v) -> acc + v)"))
          .groupBy("vec_id", "s")
          .agg(F.min(F.struct(F.col("dist"), F.col("code"))).as("m"))
          .select(F.col("vec_id"), F.col("s"),
            F.col("m.dist").as("dist"), F.col("m.code").as("code"))
      val trained = (1 to rounds).foldLeft(seeds) { (cents, _) =>
        assign(cents)
          .join(base, Seq("vec_id", "s"))
          .select(F.col("s"), F.col("code"),
            F.posexplode(F.col("x")).as(Seq("i", "v")))
          .groupBy("s", "code", "i")
          .agg(F.expr("floor((avg(v)) * 1e8 + 0.5) / 1e8").as("v"))
          .groupBy("s", "code")
          .agg(F.expr(
            """transform(array_sort(collect_list(struct(i, v))),
               p -> p.v)""").as("c"))
          .localCheckpoint() // O(nSub·k·dims) state rows per round
      }
      val out = assign(trained)
        .groupBy(F.col("s").cast("long").as("subspace"))
        .agg(F.count(F.lit(1)).as("n_vecs"),
          F.count_distinct(F.col("code")).as("codes_used"),
          F.expr("floor((avg(dist)) * 1e6 + 0.5) / 1e6").as("mse"))
      out
    },

    // Out-of-vocabulary rate per language against the global top-1000
    // word vocabulary — the multilingual-curation metric that tells
    // you which languages a fixed vocab shortchanges. Vocab = ONE
    // TakeOrdered (count desc, word tie-break — deterministic rank-
    // 1000 boundary on both engines), broadcast back as a left join;
    // per-lang rates are exact-int divisions. The exploded token
    // relation is pinned once (feeds vocab AND the occurrence count).
    "q295_oov_rate" -> { (s, dir) =>
      val tok = T.load(s, dir, "documents")
        .select(F.col("lang"),
          F.explode(TextExpressions.wordTokens(F.col("text"))).as("w"))
        .localCheckpoint()
      val top = tok.groupBy("w").agg(F.count(F.lit(1)).as("c"))
        .orderBy(F.col("c").desc, F.col("w").asc)
        .limit(1000) // TakeOrderedAndProject
        .select(F.col("w"), F.lit(1L).as("iv"))
      val out = tok.join(F.broadcast(top), Seq("w"), "left")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_tokens"),
          F.sum(F.when(F.col("iv").isNull, 1L).otherwise(0L))
            .as("n_oov"))
        .select(F.col("lang"), F.col("n_tokens"), F.col("n_oov"),
          F.expr("floor((cast(n_oov as double) / n_tokens) * 1e6 + 0.5) / 1e6")
            .as("oov_rate"))
      out
    },

    // EXACT two-sample Kolmogorov–Smirnov test — the unbinned upgrade
    // of q112 (which buckets CDFs): D = sup|F1 − F2| taken over the
    // distinct-value relation, where the sup comparison is the
    // cross-multiplied INTEGER |cum1·n2 − cum2·n1| (DECIMAL(38), so
    // the argmax has no float ties and no overflow at any scale) and
    // the two inclusive CDFs come from two `globalPrefixSum` passes —
    // no sort of data rows, no global window. Only the final D and
    // the α=0.05 critical value are floats, identical op order.
    "q296_ks_exact" -> { (s, dir) =>
      val e = T.load(s, dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("value").as("v"),
          F.when(F.col("event_type") === "click", 1L).otherwise(0L)
            .as("g"))
      val d = e.groupBy("v")
        .agg(F.sum("g").as("n1v"),
          F.sum(F.lit(1L) - F.col("g")).as("n2v"))
      val p = RelOps.globalPrefixSum(
        RelOps.globalPrefixSum(d, "n1v", "cb1", Seq(Ordering("v"))),
        "n2v", "cb2", Seq(Ordering("v")))
      val tot = e.agg(F.sum("g").as("n1"),
        (F.count(F.lit(1)) - F.sum("g")).as("n2"))
      p.crossJoin(F.broadcast(tot))
        .agg(F.max(F.abs(
            (F.col("cb1") + F.col("n1v")).cast(DecimalType(38, 0))
              * F.col("n2").cast(DecimalType(38, 0))
            - (F.col("cb2") + F.col("n2v")).cast(DecimalType(38, 0))
              * F.col("n1").cast(DecimalType(38, 0)))).as("dn"),
          F.first("n1").as("n1"), F.first("n2").as("n2"))
        .select(F.col("n1"), F.col("n2"),
          F.expr("""floor((cast(dn as double)
            / (cast(n1 as double) * n2)) * 1e6 + 0.5) / 1e6""").as("d"),
          F.expr("""floor((1.358 * sqrt((n1 + n2)
            / (cast(n1 as double) * n2))) * 1e6 + 0.5) / 1e6""").as("d_crit"))
        .withColumn("reject", F.col("d") > F.col("d_crit"))
    },

    // Per-segment AUC — q196's exact rank-sum AUC computed for every
    // market segment at once: the "is the model equally good for all
    // cohorts" fairness readout. Integer formula per group (2·Σ
    // npos·cumneg + Σ npos·nneg over 2·np·nn); the cumulative runs
    // over the COMPACT per-(segment, score) relation — a partitioned
    // window whose partitions are distinct-score counts, never data
    // rows. One fact shuffle into that relation, dims broadcast.
    "q297_group_auc" -> { (s, dir) =>
      val cust = T.load(s, dir, "customer")
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
      val ev = T.load(s, dir, "events")
        .join(F.broadcast(cust),
          F.col("user_id") === F.col("c_custkey"))
        .select(F.col("c_mktsegment"),
          F.expr("cast(floor((value * 100) * 1e0 + 0.5) / 1e0 as bigint)").as("sc"),
          F.when(F.col("event_type") === "purchase", 1L).otherwise(0L)
            .as("pos"))
      val g = ev.groupBy("c_mktsegment", "sc")
        .agg(F.sum("pos").as("npos"),
          F.sum(F.lit(1L) - F.col("pos")).as("nneg"))
      val w = Window.partitionBy("c_mktsegment").orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg",
          F.coalesce(F.sum("nneg").over(w), F.lit(0L)))
        .groupBy("c_mktsegment")
        .agg(F.sum("npos").as("np"), F.sum("nneg").as("nn"),
          F.sum(F.col("npos") * F.col("cumneg")).as("__a"),
          F.sum(F.col("npos") * F.col("nneg")).as("__b"))
        .select(F.col("c_mktsegment"), F.col("np"), F.col("nn"),
          (F.floor(((F.lit(2) * F.col("__a") + F.col("__b"))
            .cast("double")
            / (F.lit(2) * F.col("np") * F.col("nn"))) * 1e6 + 0.5) / 1e6).as("auc"))
    },

    // NDCG@10 of the brute-force cosine ranking against same-label
    // relevance — the graded ranking-quality eval the retrieval stack
    // (q45/q87/q193/q278) lacked. Ranks are q45's deterministic
    // ordering (6-dp sim, id tie-break); DCG terms 1/log2(rank+1)
    // are per-row deterministic; IDCG is a fixed-order fold over
    // min(n_rel, 10) ideal positions on BOTH engines. Queries
    // broadcast, corpus never shuffles (the q45 shape).
    "q298_ndcg" -> { (s, dir) =>
      val emb = T.load(s, dir, "embeddings")
      val q = emb.filter(F.col("vec_id") < 5)
      val knn = graft.similarity.Knn.bruteForceKnn(
        emb, q, "vec_id", "embedding", 10)
      val ql = q.select(F.col("vec_id").as("query_id"),
        F.col("label").as("qlbl"))
      val nl = emb.select(F.col("vec_id").as("neighbor_id"),
        F.col("label").as("nlbl"))
      val dcg = knn.join(F.broadcast(ql), "query_id").join(nl,
          "neighbor_id")
        .groupBy("query_id")
        .agg(F.sum(F.expr("""case when nlbl = qlbl
            then 1 / log2(cast(rank + 1 as double))
            else cast(0 as double) end""")).as("dcg"))
      val nrel = emb.select(F.col("vec_id").as("cid"),
          F.col("label").as("nlbl"))
        .join(F.broadcast(ql), F.col("cid") =!= F.col("query_id")
          && F.col("nlbl") === F.col("qlbl"))
        .groupBy("query_id").agg(F.count(F.lit(1)).as("n_rel"))
      dcg.join(nrel, "query_id")
        .select(F.col("query_id"), F.col("n_rel"),
          F.expr("floor((dcg) * 1e6 + 0.5) / 1e6").as("dcg"),
          F.expr("""floor((dcg / aggregate(
              transform(sequence(1, cast(least(n_rel, 10) as int)),
                r -> 1 / log2(cast(r + 1 as double))),
              cast(0 as double), (a, v) -> a + v)) * 1e6 + 0.5) / 1e6""").as("ndcg"))
    },

    // nDCG@10 with GRADED relevance (round-11 stretch 8): gains on
    // the 2^g − 1 scale — same label = grade 2 (gain 3), ADJACENT
    // label = grade 1 (gain 1), else 0 — over q298's deterministic
    // ranking harness (6-dp sim, id tie-break, queries broadcast).
    // IDCG is the ideal fold: all grade-2 docs first, then grade-1,
    // truncated at 10; a query with zero graded candidates defines
    // ndcg = 0 (guarded identically on both engines).
    "q347_ndcg_graded" -> { (s, dir) =>
      val emb = T.load(s, dir, "embeddings")
      val q = emb.filter(F.col("vec_id") < 8)
      val knn = graft.similarity.Knn.bruteForceKnn(
        emb, q, "vec_id", "embedding", 10)
      val ql = q.select(F.col("vec_id").as("query_id"),
        F.col("label").as("qlbl"))
      val nl = emb.select(F.col("vec_id").as("neighbor_id"),
        F.col("label").as("nlbl"))
      val dcg = knn.join(F.broadcast(ql), "query_id")
        .join(nl, "neighbor_id")
        .groupBy("query_id")
        .agg(F.sum(F.expr(
          """case when nlbl = qlbl then cast(3 as double)
                  when abs(nlbl - qlbl) = 1 then cast(1 as double)
                  else cast(0 as double) end
             / log2(cast(rank + 1 as double))""")).as("dcg"))
      val counts = emb.select(F.col("vec_id").as("cid"),
          F.col("label").as("nlbl"))
        .join(F.broadcast(ql), F.col("cid") =!= F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.when(F.expr("nlbl = qlbl"), 1)).as("n2"),
          F.count(F.when(F.expr("abs(nlbl - qlbl) = 1"), 1)).as("n1"))
      dcg.join(counts, "query_id")
        .select(F.col("query_id"), F.col("n2"), F.col("n1"),
          F.expr("floor((dcg) * 1e6 + 0.5) / 1e6").as("dcg"),
          F.expr(gradedNdcgExpr).as("ndcg"))
    },

    // recall@10 under TIE-SAFE ordering (round-11 stretch 8): the
    // fraction of a query's relevant docs captured in the top 10,
    // normalized by min(n_rel, 10) so a full page of hits scores 1.
    // "Tie-safe" = the ranking both engines replay exactly: sims
    // rounded to 6 dp (so near-ties become REAL ties) with the id-asc
    // tie-break — a raw-float ordering would let last-ulp noise flip
    // the k-boundary between engines.
    "q348_recall_at_k" -> { (s, dir) =>
      val emb = T.load(s, dir, "embeddings")
      val q = emb.filter(F.col("vec_id") < 20)
      val knn = graft.similarity.Knn.bruteForceKnn(
        emb, q, "vec_id", "embedding", 10)
      val ql = q.select(F.col("vec_id").as("query_id"),
        F.col("label").as("qlbl"))
      val nl = emb.select(F.col("vec_id").as("neighbor_id"),
        F.col("label").as("nlbl"))
      val hits = knn.join(F.broadcast(ql), "query_id")
        .join(nl, "neighbor_id")
        .groupBy("query_id")
        .agg(F.count(F.when(F.expr("nlbl = qlbl"), 1)).as("hits"))
      val nrel = emb.select(F.col("vec_id").as("cid"),
          F.col("label").as("nlbl"))
        .join(F.broadcast(ql), F.col("cid") =!= F.col("query_id")
          && F.col("nlbl") === F.col("qlbl"))
        .groupBy("query_id").agg(F.count(F.lit(1)).as("n_rel"))
      hits.join(nrel, "query_id")
        .select(F.col("query_id"), F.col("hits"), F.col("n_rel"),
          F.expr("floor((hits / cast(least(n_rel, 10) as double)) * 1e6 + 0.5) / 1e6")
            .as("recall_at_10"))
    },

    // t-closeness audit (Li et al. 2007) — the third leg of the
    // privacy trilogy (q237 k-anonymity, q286 l-diversity): per QI
    // group, the EMD between the group's ordered sensitive
    // distribution (balance band) and the global one, EMD =
    // Σ|prefix-mass gap| / (B−1). Every prefix gap is the
    // cross-multiplied INTEGER |Σ n_gj·N − Σ N_j·n_g| (no float
    // accumulation); the cumulative runs over the dense
    // (group × band) grid — an 11-row-bounded partitioned window,
    // never data rows. One fact shuffle into the count grid.
    "q299_tcloseness" -> { (s, dir) =>
      val c = T.load(s, dir, "customer")
        .select(F.col("c_nationkey"), F.col("c_mktsegment"),
          F.floor(F.col("c_acctbal") / 1000).cast("long")
            .as("band"))
      val gb = c.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).as("ngj"))
      val bands = c.groupBy("band").agg(F.count(F.lit(1)).as("nj"))
      val groups = c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).as("ng"))
      val tot = c.agg(F.count(F.lit(1)).as("nn"),
        F.count_distinct(F.col("band")).as("nb"))
      // dense grid: every group × every observed band
      val grid = groups.crossJoin(F.broadcast(bands))
        .join(gb, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .select(F.col("c_nationkey"), F.col("c_mktsegment"),
          F.col("band"), F.col("ng"), F.col("nj"),
          F.coalesce(F.col("ngj"), F.lit(0L)).as("ngj"))
      val w = Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.crossJoin(F.broadcast(tot))
        .withColumn("cg", F.sum("ngj").over(w))
        .withColumn("cj", F.sum("nj").over(w))
        // the last band's prefix gap is identically 0; summing all B
        // prefixes equals summing the first B-1
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.first("ng").as("n_cust"),
          F.sum(F.abs(F.col("cg").cast(DecimalType(38, 0))
              * F.col("nn").cast(DecimalType(38, 0))
            - F.col("cj").cast(DecimalType(38, 0))
              * F.col("ng").cast(DecimalType(38, 0)))).as("gap"),
          F.first("nb").as("nb"), F.first("nn").as("nn"))
        .select(F.col("c_nationkey"), F.col("c_mktsegment"),
          F.col("n_cust"),
          F.expr("""floor((cast(gap as double)
            / ((nb - 1) * cast(n_cust as double) * nn)) * 1e6 + 0.5) / 1e6""")
            .as("emd"))
        .withColumn("t_ok", F.col("emd") <= 0.2)
    },

    // Newman modularity of the q232 LPA communities over the same
    // co-purchase graph — the "are these communities real" quality
    // score: Q = Σ_c (m_c/m − (d_c/2m)²), computed as the exact
    // integer (4m·Σm_c − Σd_c²) / 4m² (DECIMAL(38) — degree squares
    // outgrow int64 on hub-heavy graphs). Labels come from the same
    // deterministic 4-round propagation (max-count, min-label ties);
    // intra-edge and degree sums are two keyed joins against the
    // O(nodes) label relation.
    "q300_modularity" -> { (s, dir) =>
      val ol = T.load(s, dir, "lineitem")
        .select(F.col("l_orderkey").as("o"), F.col("l_partkey").as("p"))
        .distinct()
      val edges = ol.toDF("o", "a")
        .join(ol.toDF("o2", "b"),
          F.col("o") === F.col("o2") && F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).as("nab"))
        .filter(F.col("nab") >= 2)
        .select("a", "b")
        .localCheckpoint() // feeds LPA + intra-count + degrees
      val comm = graft.ops.Graph.labelPropagation(edges, rounds = 4)
        .localCheckpoint()
      val deg = edges.select(F.col("a").as("node"))
        .unionAll(edges.select(F.col("b").as("node")))
        .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
      val dc = deg.join(comm, "node")
        .groupBy("comm").agg(F.sum("deg").as("d_c"))
      val mc = edges
        .join(comm.toDF("node", "ca"), F.col("a") === F.col("node"))
        .drop("node")
        .join(comm.toDF("node2", "cb"), F.col("b") === F.col("node2"))
        .filter(F.col("ca") === F.col("cb"))
        .groupBy(F.col("ca").as("comm"))
        .agg(F.count(F.lit(1)).as("m_c"))
      val m = edges.agg(F.count(F.lit(1)).as("m"))
      val sums = dc.join(mc, Seq("comm"), "left")
        .agg(F.count(F.lit(1)).as("n_comms"),
          F.sum(F.coalesce(F.col("m_c"), F.lit(0L))).as("smc"),
          F.sum(F.col("d_c").cast(DecimalType(38, 0))
            * F.col("d_c").cast(DecimalType(38, 0))).as("sdc2"))
      val nNodes = comm.agg(F.count(F.lit(1)).as("n_nodes"))
      val out = sums.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(nNodes))
        .select(F.col("n_comms"), F.col("n_nodes"), F.col("m"),
          F.expr("""floor(((4 * cast(m as decimal(38, 0))
              * cast(smc as decimal(38, 0)) - sdc2)
            / (4 * cast(m as double) * m * m)) * 1e6 + 0.5) / 1e6""")
            .as("modularity"))
      out
    },

    // Difference-in-differences estimator — the causal-inference
    // workhorse the experiment suite (Welch q123, CUPED q243, SRM
    // q257, permutation q250) lacked: promo-part discounts vs
    // non-promo across the 1999-01-01 policy cut, with the placebo
    // DiD inside the pre-period (split at 1997-01-01) as the
    // parallel-trends gate. Every cell mean is an exact
    // hundredth-of-discount integer sum ÷ count — bit-identical
    // doubles, no knife-edge; ONE partial-agg'd pass builds all six
    // cells (group × period fits a 6-row relation).
    "q301_did" -> { (s, dir) =>
      val li = T.load(s, dir, "lineitem")
        .join(T.load(s, dir, "part"),
          F.col("l_partkey") === F.col("p_partkey"))
        .select(
          F.when(F.col("p_type").startsWith("PROMO"), 1L)
            .otherwise(0L).as("treated"),
          F.when(F.col("l_shipdate") >= "1999-01-01", 2L)
            .when(F.col("l_shipdate") >= "1997-01-01", 1L)
            .otherwise(0L).as("period"),
          F.expr("cast(round(l_discount * 100, 0) as bigint)").as("d"))
      val cells = li.groupBy("treated", "period")
        .agg(F.sum("d").as("sd"), F.count(F.lit(1)).as("n"))
        .withColumn("m", F.expr("cast(sd as double) / n"))
        .select(F.concat(F.lit("m"), F.col("treated"),
          F.col("period")).as("k"), F.col("m"))
      val wide = cells.groupBy()
        .pivot("k", Seq("m00", "m01", "m02", "m10", "m11", "m12"))
        .agg(F.first("m"))
      wide.select(
          F.expr("round(m12 - m11, 6)").as("treated_delta"),
          F.expr("round(m02 - m01, 6)").as("control_delta"),
          F.expr("round((m12 - m11) - (m02 - m01), 6)").as("did"),
          F.expr("round((m11 - m10) - (m01 - m00), 6)")
            .as("placebo_did"))
        .withColumn("trends_ok", F.abs(F.col("placebo_did")) <= 0.25)
    },

    // Two-component Gaussian mixture via EM (3 rounds) — the
    // classic unsupervised iterative fit, run with the q285/q279
    // discipline: each round is ONE partial-agg'd scalar pass (6
    // responsibility-weighted moment sums), the M-step is closed-form
    // driver arithmetic on that 1-row collect, and ALL five
    // parameters (w, μ₁, v₁, μ₂, v₂) are rounded to 8 dp per round so
    // the unrolled-CTE oracle iterates on identical state. The
    // deterministic init is moment-based (μ ± σ/2, var σ², w = ½)
    // from exact integer cent sums — no RNG. Responsibilities are
    // per-row deterministic given the rounded params; x itself is an
    // exact-cent division, bit-identical across engines.
    "q302_em_mixture" -> { (s, dir) =>
      def r8(x: Double): Double =
        BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      val d = T.load(s, dir, "events")
        .select(F.expr("cast(floor((value * 100) * 1e0 + 0.5) / 1e0 as bigint)")
          .as("c"))
        .select(F.col("c"),
          F.expr("cast(c as double) / 100").as("x"))
        .localCheckpoint()
      val m0 = d.agg(F.count(F.lit(1)).as("n"), F.sum("c").as("s1"),
        F.sum(F.col("c").cast(DecimalType(38, 0))
          * F.col("c").cast(DecimalType(38, 0))).as("s2"))
        .collect()(0)
      val n = m0.getLong(0)
      val s1d = m0.getLong(1).toDouble
      val s2d = m0.getDecimal(2).toBigInteger.doubleValue()
      val mu = s1d / n / 100
      val va = s2d / 10000 / n - mu * mu
      var (w, mu1, v1, mu2, v2) = (0.5d,
        r8(mu - math.sqrt(va) / 2), r8(va),
        r8(mu + math.sqrt(va) / 2), r8(va))
      def resp = d.select(F.col("x"),
        F.expr(s"$w * exp(-(x - $mu1) * (x - $mu1) / (2 * $v1))"
          + s" / sqrt($v1)").as("p1"),
        F.expr(s"(1 - $w) * exp(-(x - $mu2) * (x - $mu2)"
          + s" / (2 * $v2)) / sqrt($v2)").as("p2"))
      for (_ <- 1 to 3) {
        val m = resp
          .select(F.col("x"), (F.col("p2") / (F.col("p1")
            + F.col("p2"))).as("r2"))
          .agg(F.sum(F.expr("1 - r2")).as("a1"),
            F.sum(F.expr("(1 - r2) * x")).as("b1"),
            F.sum(F.expr("(1 - r2) * x * x")).as("c1"),
            F.sum(F.expr("r2")).as("a2"),
            F.sum(F.expr("r2 * x")).as("b2"),
            F.sum(F.expr("r2 * x * x")).as("c2"))
          .collect()(0) // bounded: one 6-moment row per round
        val (a1, b1, c1) =
          (m.getDouble(0), m.getDouble(1), m.getDouble(2))
        val (a2, b2, c2) =
          (m.getDouble(3), m.getDouble(4), m.getDouble(5))
        w = r8(a1 / n); mu1 = r8(b1 / a1)
        v1 = r8(c1 / a1 - (b1 / a1) * (b1 / a1))
        mu2 = r8(b2 / a2)
        v2 = r8(c2 / a2 - (b2 / a2) * (b2 / a2))
      }
      val out = resp
        .agg(F.expr(
          "floor((avg(ln(p1 + p2)) - ln(sqrt(2 * pi()))) * 1e6 + 0.5) / 1e6")
          .as("avg_loglik"))
        .select(F.lit(n).as("n"), F.lit(w).as("w1"),
          F.lit(mu1).as("mu1"),
          F.lit(r8(math.sqrt(v1))).as("sd1"), F.lit(mu2).as("mu2"),
          F.lit(r8(math.sqrt(v2))).as("sd2"), F.col("avg_loglik"))
      out
    },

    // Per-class precision / recall / F1 of the q50 language-ID
    // heuristic against gold labels — the multi-class classifier
    // report card (q50 emits the raw confusion counts; q241 kappa
    // measures agreement; this is the per-class operating view).
    // Everything is exact-integer marginals of the ≤|classes|² count
    // grid; precision/recall are exact-int divisions (bit-identical),
    // F1 composes them with identical op order. One fact shuffle into
    // the confusion grid, O(classes) state after.
    "q303_prf_report" -> { (s, dir) =>
      val cm = T.load(s, dir, "documents")
        .withColumn("t", TextExpressions.wordTokens(F.col("text")))
        .withColumn("predicted",
          F.expr(graft.text.TextOps.langIdExpr("t")))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).as("n"))
        .localCheckpoint() // feeds 3 marginals + the accuracy scalar
      val tp = cm.filter(F.col("lang") === F.col("predicted"))
        .select(F.col("lang").as("cls"), F.col("n").as("tp"))
      val byTrue = cm.groupBy(F.col("lang").as("cls"))
        .agg(F.sum("n").as("n_true"))
      val byPred = cm.groupBy(F.col("predicted").as("cls"))
        .agg(F.sum("n").as("n_pred"))
      val acc = cm.agg(F.expr(
        """floor((sum(case when lang = predicted then n else 0 end)
           / cast(sum(n) as double)) * 1e6 + 0.5) / 1e6""").as("accuracy"))
      val out = byTrue.join(byPred, Seq("cls"), "full_outer")
        .join(tp, Seq("cls"), "left")
        .select(F.col("cls"),
          F.coalesce(F.col("tp"), F.lit(0L)).as("tp"),
          (F.coalesce(F.col("n_pred"), F.lit(0L))
            - F.coalesce(F.col("tp"), F.lit(0L))).as("fp"),
          (F.coalesce(F.col("n_true"), F.lit(0L))
            - F.coalesce(F.col("tp"), F.lit(0L))).as("fn"),
          F.coalesce(F.col("n_pred"), F.lit(0L)).as("np"),
          F.coalesce(F.col("n_true"), F.lit(0L)).as("nt"))
        .select(F.col("cls"), F.col("tp"), F.col("fp"), F.col("fn"),
          F.expr("""floor((case when np > 0
            then cast(tp as double) / np else 0 end) * 1e6 + 0.5) / 1e6""")
            .as("precision"),
          F.expr("""floor((case when nt > 0
            then cast(tp as double) / nt else 0 end) * 1e6 + 0.5) / 1e6""")
            .as("recall"))
        .withColumn("f1", F.expr(
          """floor((case when precision + recall > 0
             then 2 * precision * recall / (precision + recall)
             else 0 end) * 1e6 + 0.5) / 1e6"""))
        .crossJoin(F.broadcast(acc))
      out
    },

    // A/B test power calculator — the pre-experiment sizing readout:
    // per metric stream, the per-arm sample size needed to detect a
    // 2% lift at α = 0.05 / power 0.8, n = (z_α/2 + z_β)²·2σ²/δ².
    // σ² and the mean come from exact cent moments (integer sums →
    // bit-identical doubles), the z constants are shared literals,
    // and ceil lands on the identical double in both engines — a
    // pure closed-form projection over the per-type scalar relation.
    "q304_power_calc" -> { (s, dir) =>
      T.load(s, dir, "events")
        .select(F.col("event_type"),
          F.expr("cast(floor((value * 100) * 1e0 + 0.5) / 1e0 as bigint)").as("c"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"), F.sum("c").as("s1"),
          F.sum(F.col("c").cast(DecimalType(38, 0))
            * F.col("c").cast(DecimalType(38, 0))).as("s2"))
        .select(F.col("event_type"), F.col("n"),
          F.expr("floor((cast(s1 as double) / n / 100) * 1e6 + 0.5) / 1e6").as("mean"),
          F.expr("""floor((sqrt((cast(s2 as double) / 10000
            - (cast(s1 as double) / 100)
              * (cast(s1 as double) / 100) / n) / (n - 1))) * 1e6 + 0.5) / 1e6""")
            .as("sd"),
          F.expr("floor((0.02 * (cast(s1 as double) / n / 100)) * 1e6 + 0.5) / 1e6")
            .as("mde"),
          F.expr("""cast(ceil((1.959964 + 0.841621)
              * (1.959964 + 0.841621)
            * 2 * ((cast(s2 as double) / 10000
              - (cast(s1 as double) / 100)
                * (cast(s1 as double) / 100) / n) / (n - 1))
            / ((0.02 * (cast(s1 as double) / n / 100))
              * (0.02 * (cast(s1 as double) / n / 100))))
            as bigint)""").as("n_required"))
    },

    // Bloom-filter false-positive-rate audit — the sizing validation
    // run before anyone trusts a q106-style decontam gate: insert the
    // benchmark split's distinct shingles into a k=3-probe, m=1024-bit
    // filter, probe every CLEAN distinct shingle, and compare the
    // measured FPR against the textbook (1 − e^{−kn/m})^k. The probe
    // family is the REPLAYABLE q266 arithmetic (polyHash62 % P with
    // affine (a_i·h0 + b_i) % P remixes — plain BIGINT math DuckDB
    // replays; xxhash64, the production Bloom.scala family, is not
    // SQL-replayable, which is exactly why this audit uses the
    // portable twin). Relational shape: the bit array IS the ≤m-row
    // distinct-position relation (broadcast); a probe is a positions
    // explode + semi-count == k — no bit ops needed for the audit,
    // same set semantics.
    "q305_bloom_fpr" -> { (s, dir) =>
      val P = 2147483647L; val m = 1024; val k = 3
      val a0 = 2654435761L % P
      def posExpr(h0: String) =
        s"""transform(sequence(1, $k),
            i -> cast(pmod(pmod($a0 * (i + 1), $P) * $h0
                   + 40503 * (i + 1), $P) % $m as int))"""
      val sh = T.load(s, dir, "documents")
        .select(F.col("doc_id"),
          F.explode(TextExpressions.wordShingles(F.col("text"), 3))
            .as("sh"))
        .localCheckpoint() // feeds the insert side AND the probe side
      val benchSh = sh.filter(F.col("doc_id") % 97 === 0)
        .select("sh").distinct()
      val bits = benchSh
        // polyHash62 is nonnegative, so % P == pmod here
        .select((TextExpressions.polyHash62(F.col("sh")) % P).as("h0"))
        .select(F.explode(F.expr(posExpr("h0"))).as("p")).distinct()
        .localCheckpoint() // the "bit array": ≤ m rows
      val nIns = benchSh.agg(F.count(F.lit(1)).as("n_inserted"))
      val nBits = bits.agg(F.count(F.lit(1)).as("bits_set"))
      val probes = sh.filter(F.col("doc_id") % 97 =!= 0)
        .select("sh").distinct()
        .join(benchSh, Seq("sh"), "left_anti") // truly-clean probes
        .select(F.col("sh"),
          (TextExpressions.polyHash62(F.col("sh")) % P).as("h0"))
      val fp = probes
        .select(F.col("sh"), F.explode(F.expr(posExpr("h0"))).as("p"))
        .join(bits, Seq("p"), "left_semi")
        .groupBy("sh").agg(F.count(F.lit(1)).as("hits"))
        .filter(F.col("hits") === k)
        .agg(F.count(F.lit(1)).as("n_fp"))
      val nProbes = probes.agg(F.count(F.lit(1)).as("n_probes"))
      val out = nIns.crossJoin(F.broadcast(nBits))
        .crossJoin(F.broadcast(nProbes)).crossJoin(F.broadcast(fp))
        .select(F.col("n_inserted"), F.col("bits_set"),
          F.col("n_probes"), F.col("n_fp"),
          F.expr("floor((cast(n_fp as double) / n_probes) * 1e6 + 0.5) / 1e6")
            .as("fpr"),
          F.expr(s"""floor((pow(1 - exp(-($k
            * cast(n_inserted as double)) / $m), $k)) * 1e6 + 0.5) / 1e6""")
            .as("fpr_theory"))
        .withColumn("calibrated",
          F.abs(F.col("fpr") - F.col("fpr_theory")) <= 0.1)
      out
    },

    // Rank-biased overlap (Webber et al. 2010) between this year's
    // and last year's top-50 revenue parts — the top-k list-drift
    // monitor search/ranking teams run (Jaccard ignores order; RBO
    // weights agreement toward the head, p = 0.9). Both lists are
    // TakeOrdered 50-row relations (exact cent revenue, partkey
    // tie-break — deterministic ranks both engines); the depth sum
    // telescopes per common item to the tail coefficient
    // T(max(ra, rb)) = Σ_{d≥max} p^{d-1}/d, a fixed-order fold, so
    // RBO = (1−p)·Σ T — no d × item blow-up.
    "q306_rbo" -> { (s, dir) =>
      def top(year: Int) = {
        val r = T.load(s, dir, "lineitem")
          .filter(F.expr(s"year(l_shipdate) = $year"))
          .groupBy("l_partkey")
          .agg(F.sum(F.expr(
            "cast(floor((l_extendedprice * 100) * 1e0 + 0.5) / 1e0 as bigint)"))
            .as("rev"))
          .orderBy(F.col("rev").desc, F.col("l_partkey").asc)
          .limit(50)
        RelOps.globalRowNumber(r, "rk",
          Seq(Ordering("rev", desc = true), Ordering("l_partkey")))
      }
      val a = top(1998).select(F.col("l_partkey"),
        F.col("rk").as("ra"))
      val b = top(1999).select(F.col("l_partkey").as("pk2"),
        F.col("rk").as("rb"))
      a.join(b, F.col("l_partkey") === F.col("pk2"))
        .select(F.expr("cast(greatest(ra, rb) as int)").as("d0"))
        .agg(F.count(F.lit(1)).as("n_common"),
          F.expr("""floor((coalesce((1 - 0.9) * sum(aggregate(
              transform(sequence(d0, 50),
                d -> pow(0.9, d - 1) / d),
              cast(0 as double), (acc, v) -> acc + v)), 0)) * 1e6 + 0.5) / 1e6""")
            .as("rbo"))
        .select(F.lit(50L).as("k"), F.col("n_common"), F.col("rbo"))
    }
  )

  /** One unrolled oracle round: pair counts over v{r-1}, the 1-row
    * argmax m{r}, and the merged vocabulary v{r}. */
  private def bpeRoundSql(r: Int): String =
    s"""p$r AS (SELECT pr[1] pa, pr[2] pb, CAST(sum(c) AS BIGINT) n
           FROM (SELECT c, unnest([[s[i], s[i+1]]
                   for i in range(1, len(s))]) pr
                 FROM (SELECT string_split(rep[2:-2], ')(') s, c
                       FROM v${r - 1}) a) b
           GROUP BY 1, 2),
        m$r AS MATERIALIZED (SELECT pa, pb, n FROM p$r
           ORDER BY n DESC, pa, pb LIMIT 1),
        v$r AS MATERIALIZED (SELECT replace(rep,
             '(' || pa || ')(' || pb || ')', '(' || pa || pb || ')') rep,
             c
           FROM v${r - 1} CROSS JOIN m$r)"""

  /** The A&S 7.1.26 two-sided p fragment over a pre-rounded z column
    * — identical formula text on both engines (see q284). */
  private def pFromZ(z: String): String =
    s"""(((((1.061405429 * (1 / (1 + 0.3275911
         * (abs($z) / sqrt(2)))) - 1.453152027)
       * (1 / (1 + 0.3275911 * (abs($z) / sqrt(2))))
       + 1.421413741)
       * (1 / (1 + 0.3275911 * (abs($z) / sqrt(2))))
       - 0.284496736)
       * (1 / (1 + 0.3275911 * (abs($z) / sqrt(2))))
       + 0.254829592)
       * (1 / (1 + 0.3275911 * (abs($z) / sqrt(2))))
       * exp(-(abs($z) / sqrt(2)) * (abs($z) / sqrt(2))))"""

  /** One unrolled Newton round for q285: moment sums over d with the
    * previous (a, b) — columns of ab{r-1} for r > 1, 0.0 literals for
    * round 1 — then the 8-dp-rounded closed-form 2×2 update. */
  private def plattRoundSql(r: Int): String = {
    val (ap, bp, prev) =
      if (r == 1) ("0.0::DOUBLE", "0.0::DOUBLE", "")
      else ("a", "b", s" CROSS JOIN ab${r - 1}")
    s"""m$r AS MATERIALIZED (SELECT sum(p - y) g0, sum((p - y) * s) g1,
           sum(p * (1 - p)) h00, sum(p * (1 - p) * s) h01,
           sum(p * (1 - p) * s * s) h11
         FROM (SELECT 1 / (1 + exp(-($ap * s + $bp))) p, s, y
               FROM d$prev) x),
        ab$r AS MATERIALIZED (SELECT
           floor(($bp - (h11 * g0 - h01 * g1)
             / (h00 * h11 - h01 * h01)) * 1e8 + 0.5) / 1e8 b,
           floor(($ap - (h00 * g1 - h01 * g0)
             / (h00 * h11 - h01 * h01)) * 1e8 + 0.5) / 1e8 a
         FROM m$r$prev)"""
  }

  def oracleSql: Map[String, String] = Map(
    "q281_bpe_train" -> {
      val rounds = (1 to BpeMerges).map(bpeRoundSql).mkString(",\n")
      val union = (1 to BpeMerges).map(r =>
        s"SELECT CAST($r AS BIGINT) merge_rank, pa AS left_sym, " +
          s"pb AS right_sym, n FROM m$r").mkString("\nUNION ALL ")
      s"""WITH wc AS MATERIALIZED (SELECT w, count(*) c
             FROM (SELECT unnest($duckToks) w FROM documents) x
             GROUP BY 1),
          v0 AS MATERIALIZED (
             SELECT regexp_replace(w, '(.)', '(\\1)', 'g') rep, c
             FROM wc),
          $rounds
          $union"""
    },

    "q283_mann_whitney" ->
      """WITH e AS MATERIALIZED (SELECT value v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END g
           FROM events WHERE event_type IN ('click', 'purchase')),
          d AS (SELECT v, count(*) n, sum(g) n1v FROM e GROUP BY 1),
          c AS (SELECT n, n1v, coalesce(sum(n) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) cb
                FROM d),
          sums AS (SELECT sum(n1v * (2 * cb + n + 1)) r2,
                          sum(n * n * n - n) tie FROM c),
          cnt AS (SELECT CAST(sum(g) AS BIGINT) n1,
                         CAST(count(*) - sum(g) AS BIGINT) n2 FROM e)
          SELECT n1, n2, u1, z, abs(z) > 1.959964 AS significant
          FROM (SELECT n1, n2,
                  floor(((r2::DOUBLE - n1::DOUBLE * (n1 + 1)) / 2) * 1e6 + 0.5) / 1e6
                    + 0 AS u1,
                  floor(((r2::DOUBLE - n1::DOUBLE * (n1 + 1)
                      - n1::DOUBLE * n2)
                    / (2 * sqrt(n1::DOUBLE * n2 / 12 * ((n1 + n2 + 1)
                      - tie::DOUBLE / ((n1 + n2)::DOUBLE
                        * (n1 + n2 - 1)))))) * 1e6 + 0.5) / 1e6 + 0 AS z
                FROM sums CROSS JOIN cnt) t""",

    "q284_bh_fdr" -> {
      val p = pFromZ("z")
      s"""WITH li AS MATERIALIZED (SELECT p_brand,
             CAST(floor((l_discount * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) d
           FROM lineitem JOIN part ON l_partkey = p_partkey),
          per AS (SELECT p_brand, count(*) n, sum(d) sm,
                    sum(d * d) sq
                  FROM li GROUP BY 1),
          tot AS (SELECT CAST(sum(n) AS BIGINT) tn,
                    CAST(sum(sm) AS BIGINT) tsm,
                    CAST(sum(sq) AS BIGINT) tsq, count(*) m FROM per),
          z AS (SELECT p_brand, CAST(n AS BIGINT) n, m,
                  floor(((sm::DOUBLE / n - tsm::DOUBLE / tn)
                    / sqrt(((tsq::DOUBLE - tsm::DOUBLE * tsm / tn)
                      / (tn - 1)) / n)) * 1e6 + 0.5) / 1e6 + 0 AS z
                FROM per CROSS JOIN tot),
          p AS (SELECT p_brand, n, m, z, floor(($p) * 1e6 + 0.5) / 1e6 + 0 AS p6
                FROM z),
          r AS (SELECT p_brand, n, z, p6, m,
                  row_number() OVER (ORDER BY p6, p_brand) AS bh_rank
                FROM p),
          k AS (SELECT max(CASE WHEN p6 <= bh_rank * 0.05::DOUBLE / m
                                THEN bh_rank END) k FROM r)
          SELECT p_brand, n, z, p6 AS p_value,
            CAST(bh_rank AS BIGINT) AS bh_rank,
            bh_rank <= coalesce(k, 0) AS rejected
          FROM r CROSS JOIN k"""
    },

    "q285_platt_scale" -> {
      val rounds = (1 to 3).map(plattRoundSql).mkString(",\n")
      s"""WITH d AS MATERIALIZED (SELECT l_discount s,
             CASE WHEN l_returnflag = 'R' THEN 1.0::DOUBLE
                  ELSE 0.0::DOUBLE END y
           FROM lineitem),
          $rounds,
          fin AS (SELECT CAST(count(*) AS BIGINT) n,
              floor((avg(-(y * ln(p) + (1 - y) * ln(1 - p)))) * 1e6 + 0.5) / 1e6
                + 0 AS logloss
            FROM (SELECT 1 / (1 + exp(-(a * s + b))) p, y
                  FROM d CROSS JOIN ab3) x)
          SELECT a + 0 AS a, b + 0 AS b, n, logloss
          FROM ab3 CROSS JOIN fin"""
    },

    "q286_ldiversity" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) bal_band
           FROM customer),
          g AS (SELECT c_nationkey, c_mktsegment, count(*) n_cust,
                  count(DISTINCT bal_band) l
                FROM c GROUP BY 1, 2)
          SELECT CAST(l AS BIGINT) AS l,
            CAST(count(*) AS BIGINT) AS n_groups,
            CAST(sum(n_cust) AS BIGINT) AS n_customers,
            l < 3 AS at_risk
          FROM g GROUP BY l""",

    "q287_link_predict" ->
      """WITH ol AS MATERIALIZED (SELECT DISTINCT l_orderkey o,
             l_partkey p FROM lineitem),
          pr AS MATERIALIZED (SELECT x.p a, y.p b
                FROM ol x JOIN ol y ON x.o = y.o AND x.p < y.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
          e AS MATERIALIZED (SELECT a u, b w FROM pr
                UNION ALL SELECT b u, a w FROM pr),
          dg AS (SELECT w, count(*) deg FROM e GROUP BY 1),
          ew AS (SELECT u, e.w, deg FROM e JOIN dg ON e.w = dg.w
                 WHERE deg <= 128),
          wedge AS (SELECT x.u a, y.u b, x.deg
                    FROM ew x JOIN ew y ON x.w = y.w AND x.u < y.u),
          cand AS (SELECT a, b,
                     floor((sum(1 / ln(deg::DOUBLE))) * 1e6 + 0.5) / 1e6 + 0 score,
                     CAST(count(*) AS BIGINT) n_common
                   FROM wedge GROUP BY 1, 2),
          new AS (SELECT c.a, c.b, c.n_common, c.score
                  FROM cand c LEFT JOIN pr
                    ON c.a = pr.a AND c.b = pr.b
                  WHERE pr.a IS NULL)
          SELECT a, b, n_common, score FROM new
          ORDER BY score DESC, a, b LIMIT 20""",

    "q288_epoch_alloc" ->
      """WITH n AS (SELECT source, count(*) n_docs FROM documents
                    GROUP BY 1),
          tot AS (SELECT sum(sqrt(n_docs::DOUBLE)) ssq FROM n),
          q AS (SELECT source, CAST(n_docs AS BIGINT) n_docs,
                  floor((100000 * sqrt(n_docs::DOUBLE) / ssq) * 1e6 + 0.5) / 1e6 + 0
                    AS quota
                FROM n CROSS JOIN tot),
          f AS (SELECT source, n_docs, quota,
                  CAST(floor(quota) AS BIGINT) base,
                  floor((quota - CAST(floor(quota) AS BIGINT)) * 1e6 + 0.5) / 1e6 rem
                FROM q),
          r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
                  rk FROM f),
          lo AS (SELECT 100000 - sum(base) leftover FROM f)
          SELECT source, n_docs, quota,
            base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
          FROM r CROSS JOIN lo""",

    "q289_wilcoxon" ->
      """WITH ev AS MATERIALIZED (SELECT user_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END g,
             CAST(floor((value * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) cents
           FROM events WHERE event_type IN ('click', 'purchase')),
          per AS (SELECT user_id,
                    sum(CASE WHEN g = 1 THEN cents END) sc,
                    sum(g) nc,
                    sum(CASE WHEN g = 0 THEN cents END) sp,
                    sum(1 - g) np
                  FROM ev GROUP BY 1
                  HAVING sum(g) > 0 AND sum(1 - g) > 0),
          d AS (SELECT floor((sc::DOUBLE / nc - sp::DOUBLE / np) * 1e6 + 0.5) / 1e6 d
                FROM per),
          nz AS (SELECT abs(d) ad,
                   CASE WHEN d > 0 THEN 1 ELSE 0 END pos
                 FROM d WHERE d != 0),
          dv AS (SELECT ad, count(*) n, sum(pos) npos FROM nz
                 GROUP BY 1),
          c AS (SELECT n, npos, coalesce(sum(n) OVER (ORDER BY ad
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) cb
                FROM dv),
          sums AS (SELECT sum(npos * (2 * cb + n + 1)) w2,
                     sum(n * n * n - n) tie,
                     CAST(sum(n) AS BIGINT) n
                   FROM c)
          SELECT n AS n_pairs,
            floor((w2::DOUBLE / 2) * 1e6 + 0.5) / 1e6 + 0 AS w_plus, z,
            abs(z) > 1.959964 AS significant
          FROM (SELECT n,  w2,
                  floor(((w2::DOUBLE - n::DOUBLE * (n + 1) / 2)
                    / (2 * sqrt((2 * n::DOUBLE * (n + 1) * (2 * n + 1)
                      - tie::DOUBLE) / 48))) * 1e6 + 0.5) / 1e6 + 0 AS z
                FROM sums) t""",

    "q290_label_fusion" ->
      """WITH an AS MATERIALIZED (SELECT l_partkey item,
             l_suppkey ann, l_returnflag lbl FROM lineitem),
          mc AS (SELECT item, lbl, count(*) cnt FROM an GROUP BY 1, 2),
          maj AS MATERIALIZED (SELECT item, lbl maj FROM (
                  SELECT item, lbl, row_number() OVER (
                    PARTITION BY item ORDER BY cnt DESC, lbl) rn
                  FROM mc) t
                WHERE rn = 1),
          rel AS (SELECT ann, CAST(floor((1000000
                    * sum(CASE WHEN lbl = maj THEN 1 ELSE 0 END)
                    / count(*)) * 1e0 + 0.5) / 1e0 AS BIGINT) rel
                  FROM an JOIN maj USING (item) GROUP BY 1),
          wt AS (SELECT item, lbl, sum(rel) wt
                 FROM an JOIN rel USING (ann) GROUP BY 1, 2),
          fused AS MATERIALIZED (SELECT item, lbl fused FROM (
                  SELECT item, lbl, row_number() OVER (
                    PARTITION BY item ORDER BY wt DESC, lbl) rn
                  FROM wt) t
                WHERE rn = 1),
          o1 AS (SELECT maj AS label, count(*) n_majority,
                   sum(CASE WHEN fused = maj THEN 0 ELSE 1 END)
                     n_flipped
                 FROM maj JOIN fused USING (item) GROUP BY 1),
          o2 AS (SELECT fused AS label, count(*) n_weighted FROM fused
                 GROUP BY 1)
          SELECT coalesce(o1.label, o2.label) AS label,
            CAST(coalesce(n_majority, 0) AS BIGINT) AS n_majority,
            CAST(coalesce(n_weighted, 0) AS BIGINT) AS n_weighted,
            CAST(coalesce(n_flipped, 0) AS BIGINT) AS n_flipped
          FROM o1 FULL OUTER JOIN o2 ON o1.label = o2.label""",

    "q291_conformal" ->
      """WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,
             CAST(floor((value * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) cents FROM events),
          mu AS (SELECT event_type, sum(cents) sm, count(*) nt
                 FROM ev GROUP BY 1),
          scored AS MATERIALIZED (SELECT event_id, user_id,
             floor((abs(cents - sm::DOUBLE / nt)) * 1e6 + 0.5) / 1e6 s
           FROM ev JOIN mu USING (event_type)),
          cal AS (SELECT s, row_number() OVER (ORDER BY s, event_id) rk
                  FROM scored WHERE user_id % 2 = 0),
          nc AS (SELECT count(*) n_cal FROM cal),
          kk AS (SELECT n_cal, (9 * (n_cal + 1) + 9) // 10 k FROM nc),
          qh AS (SELECT n_cal, k, s qhat FROM cal JOIN kk ON rk = k),
          cov AS (SELECT CAST(n_cal AS BIGINT) n_cal,
              CAST(k AS BIGINT) k, qhat,
              CAST(count(*) AS BIGINT) n_test,
              floor((sum(CASE WHEN s <= qhat THEN 1 ELSE 0 END)
                / CAST(count(1) AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0 AS coverage
            FROM scored CROSS JOIN qh WHERE user_id % 2 != 0
            GROUP BY 1, 2, 3)
          SELECT n_cal, k, qhat, n_test, coverage,
            coverage >= 0.88 AS covered_ok
          FROM cov""",

    "q292_bpe_apply" -> {
      val rounds = (1 to BpeMerges).map(bpeRoundSql).mkString(",\n")
      s"""WITH wc AS MATERIALIZED (SELECT w, count(*) c
             FROM (SELECT unnest($duckToks) w FROM documents) x
             GROUP BY 1),
          v0 AS MATERIALIZED (
             SELECT regexp_replace(w, '(.)', '(\\1)', 'g') rep, c
             FROM wc),
          $rounds,
          fin AS (SELECT CAST(count(*) AS BIGINT) vocab_words,
              CAST(sum(c * wlen) AS BIGINT) chars_before,
              CAST(sum(c * slen) AS BIGINT) symbols_after
            FROM (SELECT c,
                    len(string_split(rep[2:-2], ')(')) slen,
                    length(replace(replace(rep, '(', ''), ')', ''))
                      wlen
                  FROM v$BpeMerges) x)
          SELECT CAST($BpeMerges AS BIGINT) n_merges, vocab_words,
            chars_before, symbols_after,
            floor((symbols_after::DOUBLE / chars_before) * 1e6 + 0.5) / 1e6 + 0
              AS compression
          FROM fin"""
    },

    "q313_bpe_corpus" -> {
      val rounds = (1 to BpeMerges).map(bpeRoundSql).mkString(",\n")
      s"""WITH wc AS MATERIALIZED (SELECT w, count(*) c
             FROM (SELECT unnest($duckToks) w FROM documents) x
             GROUP BY 1),
          v0 AS MATERIALIZED (
             SELECT regexp_replace(w, '(.)', '(\\1)', 'g') rep, c
             FROM wc),
          $rounds,
          wmap AS MATERIALIZED (
             SELECT replace(replace(rep, '(', ''), ')', '') w,
               CAST(len(string_split(rep[2:-2], ')(')) AS BIGINT) n_sub
             FROM v$BpeMerges),
          docw AS (SELECT doc_id, unnest($duckToks) w FROM documents)
          SELECT doc_id, CAST(count(*) AS BIGINT) n_words,
            CAST(sum(n_sub) AS BIGINT) n_tokens,
            CAST(sum(length(w)) AS BIGINT) n_chars,
            floor((sum(n_sub)::DOUBLE / sum(length(w))) * 1e6 + 0.5) / 1e6 + 0
              AS compression
          FROM docw JOIN wmap USING (w)
          GROUP BY doc_id"""
    },

    "q293_filter_sweep" ->
      """WITH d AS (SELECT n_chars,
             len(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9]+'), x -> x != '')) n_toks
           FROM documents),
          sc AS (SELECT n_chars,
                   floor((100 * n_toks::DOUBLE / n_chars) * 1e6 + 0.5) / 1e6 score
                 FROM d),
          g AS (SELECT sc.n_chars, sc.score, t
                FROM sc, (SELECT unnest(range(10, 23, 2)) t) th)
          SELECT CAST(t AS BIGINT) AS t,
            CAST(sum(CASE WHEN score >= t / 100.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
            CAST(sum(CASE WHEN score >= t / 100.0 THEN n_chars
              ELSE 0 END) AS BIGINT) AS chars_kept,
            floor((sum(CASE WHEN score >= t / 100.0 THEN 1 ELSE 0 END)
              / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0 AS frac_kept
          FROM g GROUP BY 1""",

    "q294_pq" -> {
      // strict LEFT fold (list_reduce over a 0-prepended list — the
      // duckPoly precedent) so per-row distances are bit-identical to
      // Spark's aggregate() fold; centroid state is 8-dp per round
      def dist(x: String, c: String): String =
        s"""list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, 17),
               i -> ($x[i] - $c[i]) * ($x[i] - $c[i]))),
             (a, b) -> a + b)"""
      def assignSql(r: Int, cents: String): String =
        s"""a$r AS MATERIALIZED (SELECT vec_id, s, dist, code FROM (
             SELECT vec_id, s, dist, code, row_number() OVER (
               PARTITION BY vec_id, s ORDER BY dist, code) rn
             FROM (SELECT b.vec_id, b.s, $cents.code,
                     ${dist("b.x", s"$cents.c")} dist
                   FROM base b JOIN $cents ON b.s = $cents.s) u) t
           WHERE rn = 1)"""
      def updateSql(r: Int): String =
        s"""u$r AS (SELECT s, code, i, floor((avg(v)) * 1e8 + 0.5) / 1e8 v FROM (
             SELECT a$r.s, a$r.code, i, x[i] v
             FROM a$r JOIN base USING (vec_id, s),
               (SELECT unnest(range(1, 17)) i) ii) t
           GROUP BY 1, 2, 3),
          c$r AS MATERIALIZED (SELECT s, code, list(v ORDER BY i) c
           FROM u$r GROUP BY 1, 2)"""
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) emb
           FROM embeddings),
          base AS MATERIALIZED (SELECT vec_id, s,
             emb[(s * 16 + 1):(s * 16 + 16)] x
           FROM e, (SELECT unnest(range(0, 4)) s) ss),
          sd AS MATERIALIZED (SELECT emb, row_number() OVER (
               ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296, vec_id)
               - 1 code
             FROM e
             ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296, vec_id
             LIMIT 4),
          c0 AS MATERIALIZED (SELECT s, code,
             list_transform(emb[(s * 16 + 1):(s * 16 + 16)],
               x -> floor((x) * 1e8 + 0.5) / 1e8) c
           FROM sd, (SELECT unnest(range(0, 4)) s) ss),
          ${assignSql(1, "c0")},
          ${updateSql(1)},
          ${assignSql(2, "c1")},
          ${updateSql(2)},
          ${assignSql(3, "c2")}
          SELECT CAST(s AS BIGINT) AS subspace,
            CAST(count(*) AS BIGINT) AS n_vecs,
            CAST(count(DISTINCT code) AS BIGINT) AS codes_used,
            floor((avg(dist)) * 1e6 + 0.5) / 1e6 + 0 AS mse
          FROM a3 GROUP BY 1"""
    },

    "q295_oov_rate" -> {
      s"""WITH tok AS MATERIALIZED (SELECT lang, unnest($duckToks) w
           FROM documents),
          top AS MATERIALIZED (SELECT w FROM (
              SELECT w, count(*) c FROM tok GROUP BY 1)
            ORDER BY c DESC, w LIMIT 1000)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_oov,
            floor((sum(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END)::DOUBLE
              / count(*)) * 1e6 + 0.5) / 1e6 + 0 AS oov_rate
          FROM tok LEFT JOIN top ON tok.w = top.w
          GROUP BY 1"""
    },

    "q296_ks_exact" ->
      """WITH e AS MATERIALIZED (SELECT value v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END g
           FROM events WHERE event_type IN ('click', 'purchase')),
          d AS (SELECT v, sum(g) n1v, sum(1 - g) n2v FROM e
                GROUP BY 1),
          c AS (SELECT n1v, n2v,
                  coalesce(sum(n1v) OVER w, 0) cb1,
                  coalesce(sum(n2v) OVER w, 0) cb2
                FROM d WINDOW w AS (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
          tot AS (SELECT CAST(sum(g) AS BIGINT) n1,
                    CAST(count(*) - sum(g) AS BIGINT) n2 FROM e),
          m AS (SELECT max(abs((cb1 + n1v) * n2 - (cb2 + n2v) * n1))
                  dn, any_value(n1) n1, any_value(n2) n2
                FROM c CROSS JOIN tot)
          SELECT n1, n2, d, d_crit, d > d_crit AS reject
          FROM (SELECT n1, n2,
                  floor((dn::DOUBLE / (n1::DOUBLE * n2)) * 1e6 + 0.5) / 1e6 + 0 AS d,
                  floor((1.358 * sqrt((n1 + n2)
                    / (n1::DOUBLE * n2))) * 1e6 + 0.5) / 1e6 + 0 AS d_crit
                FROM m) t""",

    "q297_group_auc" ->
      """WITH ev AS MATERIALIZED (SELECT c_mktsegment,
             CAST(floor((value * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) sc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END pos
           FROM events JOIN customer ON user_id = c_custkey),
          g AS (SELECT c_mktsegment, sc, sum(pos) npos,
                  sum(1 - pos) nneg
                FROM ev GROUP BY 1, 2),
          c AS (SELECT c_mktsegment, npos, nneg,
                  coalesce(sum(nneg) OVER (PARTITION BY c_mktsegment
                    ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) cumneg
                FROM g)
          SELECT c_mktsegment, CAST(sum(npos) AS BIGINT) AS np,
            CAST(sum(nneg) AS BIGINT) AS nn,
            floor(((2 * sum(npos * cumneg)
              + sum(npos * nneg))::DOUBLE
              / (2 * sum(npos) * sum(nneg))) * 1e6 + 0.5) / 1e6 + 0 AS auc
          FROM c GROUP BY 1""",

    "q298_ndcg" ->
      """WITH q AS MATERIALIZED (SELECT vec_id qid, embedding,
             label qlbl FROM embeddings WHERE vec_id < 5),
          sims AS MATERIALIZED (SELECT qid,
             CASE WHEN c.label = qlbl THEN 1 ELSE 0 END relv,
             row_number() OVER (PARTITION BY qid
               ORDER BY floor((list_cosine_similarity(
                 q.embedding::DOUBLE[], c.embedding::DOUBLE[])) * 1e6 + 0.5) / 1e6
                 DESC, c.vec_id) rnk
           FROM q JOIN embeddings c ON c.vec_id != q.qid),
          dcg AS (SELECT qid, sum(CASE WHEN relv = 1
                    THEN 1 / log2((rnk + 1)::DOUBLE)
                    ELSE 0.0::DOUBLE END) dcg
                  FROM sims WHERE rnk <= 10 GROUP BY 1),
          nr AS (SELECT qid, CAST(count(*) AS BIGINT) n_rel
                 FROM q JOIN embeddings c
                   ON c.vec_id != q.qid AND c.label = q.qlbl
                 GROUP BY 1)
          SELECT qid AS query_id, n_rel, floor((dcg) * 1e6 + 0.5) / 1e6 + 0 AS dcg,
            floor((dcg / list_reduce(list_prepend(0.0::DOUBLE,
              [1 / log2((r + 1)::DOUBLE)
               for r in range(1, least(n_rel, 10) + 1)]),
              (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 + 0 AS ndcg
          FROM dcg JOIN nr USING (qid)""",

    "q347_ndcg_graded" ->
      """WITH q AS MATERIALIZED (SELECT vec_id qid, embedding,
             label qlbl FROM embeddings WHERE vec_id < 8),
          sims AS MATERIALIZED (SELECT qid,
             CASE WHEN c.label = qlbl THEN 3.0::DOUBLE
                  WHEN abs(c.label - qlbl) = 1 THEN 1.0::DOUBLE
                  ELSE 0.0::DOUBLE END gain,
             row_number() OVER (PARTITION BY qid
               ORDER BY floor((list_cosine_similarity(
                 q.embedding::DOUBLE[], c.embedding::DOUBLE[])) * 1e6 + 0.5) / 1e6
                 DESC, c.vec_id) rnk
           FROM q JOIN embeddings c ON c.vec_id != q.qid),
          dcg AS (SELECT qid,
                    sum(gain / log2((rnk + 1)::DOUBLE)) dcg
                  FROM sims WHERE rnk <= 10 GROUP BY 1),
          nr AS (SELECT qid,
                   CAST(count(*) FILTER (WHERE c.label = qlbl)
                     AS BIGINT) n2,
                   CAST(count(*) FILTER (WHERE abs(c.label - qlbl) = 1)
                     AS BIGINT) n1
                 FROM q JOIN embeddings c ON c.vec_id != q.qid
                 GROUP BY 1)
          SELECT qid AS query_id, n2, n1, floor((dcg) * 1e6 + 0.5) / 1e6 + 0 AS dcg,
            floor((CASE WHEN n2 + n1 = 0 THEN 0.0::DOUBLE
              ELSE dcg / (list_reduce(list_prepend(0.0::DOUBLE,
                  [3 / log2((r + 1)::DOUBLE)
                   for r in range(1, least(n2, 10) + 1)]),
                  (a, b) -> a + b)
                + CASE WHEN n2 < 10 AND n1 > 0 THEN
                    list_reduce(list_prepend(0.0::DOUBLE,
                      [1 / log2((r + 1)::DOUBLE)
                       for r in range(n2 + 1,
                         least(n2 + n1, 10) + 1)]),
                      (a, b) -> a + b)
                  ELSE 0.0::DOUBLE END) END) * 1e6 + 0.5) / 1e6 + 0 AS ndcg
          FROM dcg JOIN nr USING (qid)""",

    "q348_recall_at_k" ->
      """WITH q AS MATERIALIZED (SELECT vec_id qid, embedding,
             label qlbl FROM embeddings WHERE vec_id < 20),
          sims AS MATERIALIZED (SELECT qid,
             CASE WHEN c.label = qlbl THEN 1 ELSE 0 END relv,
             row_number() OVER (PARTITION BY qid
               ORDER BY floor((list_cosine_similarity(
                 q.embedding::DOUBLE[], c.embedding::DOUBLE[])) * 1e6 + 0.5) / 1e6
                 DESC, c.vec_id) rnk
           FROM q JOIN embeddings c ON c.vec_id != q.qid),
          h AS (SELECT qid, CAST(count(*) FILTER (WHERE relv = 1)
                  AS BIGINT) hits
                FROM sims WHERE rnk <= 10 GROUP BY 1),
          nr AS (SELECT qid, CAST(count(*) AS BIGINT) n_rel
                 FROM q JOIN embeddings c
                   ON c.vec_id != q.qid AND c.label = q.qlbl
                 GROUP BY 1)
          SELECT qid AS query_id, hits, n_rel,
            floor((hits / least(n_rel, 10)::DOUBLE) * 1e6 + 0.5) / 1e6 + 0
              AS recall_at_10
          FROM h JOIN nr USING (qid)""",

    "q299_tcloseness" ->
      """WITH c AS MATERIALIZED (SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) band
           FROM customer),
          gb AS (SELECT c_nationkey, c_mktsegment, band, count(*) ngj
                 FROM c GROUP BY 1, 2, 3),
          bands AS (SELECT band, count(*) nj FROM c GROUP BY 1),
          grp AS (SELECT c_nationkey, c_mktsegment, count(*) ng
                  FROM c GROUP BY 1, 2),
          tot AS (SELECT count(*) nn, count(DISTINCT band) nb FROM c),
          grid AS (SELECT g.c_nationkey, g.c_mktsegment, b.band,
                     g.ng, b.nj, coalesce(gb.ngj, 0) ngj, nn, nb
                   FROM grp g CROSS JOIN bands b CROSS JOIN tot
                   LEFT JOIN gb ON gb.c_nationkey = g.c_nationkey
                     AND gb.c_mktsegment = g.c_mktsegment
                     AND gb.band = b.band),
          cum AS (SELECT c_nationkey, c_mktsegment, ng, nn, nb,
                    sum(ngj) OVER w cg, sum(nj) OVER w cj
                  FROM grid WINDOW w AS (
                    PARTITION BY c_nationkey, c_mktsegment
                    ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW)),
          a AS (SELECT c_nationkey, c_mktsegment,
                  any_value(ng) n_cust, any_value(nb) nb,
                  any_value(nn) nn, sum(abs(cg * nn - cj * ng)) gap
                FROM cum GROUP BY 1, 2)
          SELECT c_nationkey, c_mktsegment,
            CAST(n_cust AS BIGINT) AS n_cust, emd,
            emd <= 0.2::DOUBLE AS t_ok
          FROM (SELECT c_nationkey, c_mktsegment, n_cust,
                  floor((gap::DOUBLE
                    / ((nb - 1) * n_cust::DOUBLE * nn)) * 1e6 + 0.5) / 1e6 + 0 AS emd
                FROM a) t""",

    "q300_modularity" -> {
      // reuse q232's LPA replay verbatim — ONE source of truth for
      // the 4-round label chain — and append the modularity rollup
      val base = EvalQueries.oracleSql("q232_label_prop")
      require(base.trim.endsWith("FROM l4"), "q232 oracle shape moved")
      val ctes = base.substring(0, base.lastIndexOf("SELECT")).trim
      s"""$ctes,
          deg AS (SELECT node, count(*) deg FROM (
                    SELECT a node FROM e1
                    UNION ALL SELECT b FROM e1) x GROUP BY 1),
          labc AS (SELECT node, lab AS comm FROM l4),
          dc AS (SELECT comm, sum(deg) d_c
                 FROM deg JOIN labc USING (node) GROUP BY 1),
          mc AS (SELECT la.comm, count(*) m_c
                 FROM e1 JOIN labc la ON e1.a = la.node
                   JOIN labc lb ON e1.b = lb.node
                 WHERE la.comm = lb.comm GROUP BY 1),
          mm AS (SELECT count(*) m FROM e1),
          sums AS (SELECT count(*) n_comms,
                     sum(coalesce(m_c, 0)) smc, sum(d_c * d_c) sdc2
                   FROM dc LEFT JOIN mc USING (comm)),
          nn AS (SELECT count(*) n_nodes FROM l4)
          SELECT CAST(n_comms AS BIGINT) AS n_comms,
            CAST(n_nodes AS BIGINT) AS n_nodes,
            CAST(m AS BIGINT) AS m,
            floor(((4 * m * smc - sdc2)
              / (4 * m::DOUBLE * m * m)) * 1e6 + 0.5) / 1e6 + 0 AS modularity
          FROM sums CROSS JOIN mm CROSS JOIN nn"""
    },

    "q301_did" ->
      """WITH li AS MATERIALIZED (SELECT
             CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END treated,
             CASE WHEN l_shipdate >= DATE '1999-01-01' THEN 2
                  WHEN l_shipdate >= DATE '1997-01-01' THEN 1
                  ELSE 0 END period,
             CAST(round(l_discount * 100, 0) AS BIGINT) d
           FROM lineitem JOIN part ON l_partkey = p_partkey),
          c AS (SELECT treated, period,
                  sum(d)::DOUBLE / count(*) m
                FROM li GROUP BY 1, 2),
          w AS (SELECT
             max(CASE WHEN treated = 0 AND period = 0 THEN m END) m00,
             max(CASE WHEN treated = 0 AND period = 1 THEN m END) m01,
             max(CASE WHEN treated = 0 AND period = 2 THEN m END) m02,
             max(CASE WHEN treated = 1 AND period = 0 THEN m END) m10,
             max(CASE WHEN treated = 1 AND period = 1 THEN m END) m11,
             max(CASE WHEN treated = 1 AND period = 2 THEN m END) m12
           FROM c)
          SELECT treated_delta, control_delta, did, placebo_did,
            abs(placebo_did) <= 0.25::DOUBLE AS trends_ok
          FROM (SELECT round(m12 - m11, 6) + 0 AS treated_delta,
                  round(m02 - m01, 6) + 0 AS control_delta,
                  round((m12 - m11) - (m02 - m01), 6) + 0 AS did,
                  round((m11 - m10) - (m01 - m00), 6) + 0
                    AS placebo_did
                FROM w) t""",

    "q302_em_mixture" -> {
      def emRound(r: Int): String = {
        val prev = s"p${r - 1}"
        s"""m$r AS MATERIALIZED (SELECT sum(1 - r2) a1,
               sum((1 - r2) * x) b1, sum((1 - r2) * x * x) c1,
               sum(r2) a2, sum(r2 * x) b2, sum(r2 * x * x) c2
             FROM (SELECT x, p2 / (p1 + p2) r2 FROM (
                SELECT x,
                  w * exp(-(x - mu1) * (x - mu1) / (2 * v1))
                    / sqrt(v1) p1,
                  (1 - w) * exp(-(x - mu2) * (x - mu2) / (2 * v2))
                    / sqrt(v2) p2
                FROM d CROSS JOIN $prev) a) b),
            p$r AS MATERIALIZED (SELECT floor((a1 / n) * 1e8 + 0.5) / 1e8 w,
               floor((b1 / a1) * 1e8 + 0.5) / 1e8 mu1,
               floor((c1 / a1 - (b1 / a1) * (b1 / a1)) * 1e8 + 0.5) / 1e8 v1,
               floor((b2 / a2) * 1e8 + 0.5) / 1e8 mu2,
               floor((c2 / a2 - (b2 / a2) * (b2 / a2)) * 1e8 + 0.5) / 1e8 v2
             FROM m$r CROSS JOIN nn)"""
      }
      s"""WITH d AS MATERIALIZED (SELECT c, c::DOUBLE / 100 x FROM (
             SELECT CAST(floor((value * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) c
             FROM events) e),
          nn AS (SELECT count(*) n FROM d),
          mom AS (SELECT count(*) n, sum(c) s1, sum(c * c) s2 FROM d),
          p0 AS MATERIALIZED (SELECT 0.5::DOUBLE w,
             floor((mu - sqrt(va) / 2) * 1e8 + 0.5) / 1e8 mu1, floor((va) * 1e8 + 0.5) / 1e8 v1,
             floor((mu + sqrt(va) / 2) * 1e8 + 0.5) / 1e8 mu2, floor((va) * 1e8 + 0.5) / 1e8 v2
           FROM (SELECT s1::DOUBLE / n / 100 mu,
                   s2::DOUBLE / 10000 / n
                     - (s1::DOUBLE / n / 100) * (s1::DOUBLE / n / 100)
                     va
                 FROM mom) t),
          ${emRound(1)},
          ${emRound(2)},
          ${emRound(3)},
          ll AS (SELECT floor((avg(ln(p1 + p2))
                   - ln(sqrt(2 * pi()))) * 1e6 + 0.5) / 1e6 + 0 avg_loglik
                 FROM (SELECT
                     w * exp(-(x - mu1) * (x - mu1) / (2 * v1))
                       / sqrt(v1) p1,
                     (1 - w) * exp(-(x - mu2) * (x - mu2) / (2 * v2))
                       / sqrt(v2) p2
                   FROM d CROSS JOIN p3) z)
          SELECT CAST(n AS BIGINT) AS n, w + 0 AS w1, mu1 + 0 AS mu1,
            floor((sqrt(v1)) * 1e8 + 0.5) / 1e8 + 0 AS sd1, mu2 + 0 AS mu2,
            floor((sqrt(v2)) * 1e8 + 0.5) / 1e8 + 0 AS sd2, avg_loglik
          FROM p3 CROSS JOIN nn CROSS JOIN ll"""
    },

    "q303_prf_report" -> {
      // reuse q50's langid replay verbatim — one source of truth for
      // the heuristic — as a nested CTE producing (lang, predicted, n)
      val q50 = PipelineQueries.oracleSql("q50_langid")
      s"""WITH cm AS MATERIALIZED ($q50),
          tpc AS (SELECT lang cls, n tpn FROM cm
                  WHERE lang = predicted),
          bt AS (SELECT lang cls, sum(n) n_true FROM cm GROUP BY 1),
          bp AS (SELECT predicted cls, sum(n) n_pred FROM cm
                 GROUP BY 1),
          acc AS (SELECT floor((sum(CASE WHEN lang = predicted
                      THEN n ELSE 0 END)
                    / CAST(sum(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0 accuracy
                  FROM cm),
          j AS (SELECT coalesce(bt.cls, bp.cls) cls,
                  coalesce(tpn, 0) tp,
                  coalesce(n_pred, 0) - coalesce(tpn, 0) fp,
                  coalesce(n_true, 0) - coalesce(tpn, 0) fn,
                  coalesce(n_pred, 0) np, coalesce(n_true, 0) nt
                FROM bt FULL OUTER JOIN bp ON bt.cls = bp.cls
                  LEFT JOIN tpc
                    ON coalesce(bt.cls, bp.cls) = tpc.cls),
          pr AS (SELECT cls, tp, fp, fn,
                   floor((CASE WHEN np > 0 THEN tp::DOUBLE / np
                     ELSE 0 END) * 1e6 + 0.5) / 1e6 + 0 prec,
                   floor((CASE WHEN nt > 0 THEN tp::DOUBLE / nt
                     ELSE 0 END) * 1e6 + 0.5) / 1e6 + 0 rec
                 FROM j)
          SELECT cls, CAST(tp AS BIGINT) AS tp,
            CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
            prec AS "precision", rec AS "recall",
            floor((CASE WHEN prec + rec > 0
              THEN 2 * prec * rec / (prec + rec)
              ELSE 0 END) * 1e6 + 0.5) / 1e6 + 0 AS f1,
            accuracy
          FROM pr CROSS JOIN acc"""
    },

    "q304_power_calc" ->
      """WITH m AS (SELECT event_type, count(*) n, sum(c) s1,
             sum(c * c) s2
           FROM (SELECT event_type,
                   CAST(floor((value * 100) * 1e0 + 0.5) / 1e0 AS BIGINT) c
                 FROM events) e
           GROUP BY 1)
          SELECT event_type, CAST(n AS BIGINT) AS n,
            floor((s1::DOUBLE / n / 100) * 1e6 + 0.5) / 1e6 + 0 AS mean,
            floor((sqrt((s2::DOUBLE / 10000
              - (s1::DOUBLE / 100) * (s1::DOUBLE / 100) / n)
              / (n - 1))) * 1e6 + 0.5) / 1e6 + 0 AS sd,
            floor((0.02 * (s1::DOUBLE / n / 100)) * 1e6 + 0.5) / 1e6 + 0 AS mde,
            CAST(ceil((1.959964 + 0.841621) * (1.959964 + 0.841621)
              * 2 * ((s2::DOUBLE / 10000
                - (s1::DOUBLE / 100) * (s1::DOUBLE / 100) / n)
                / (n - 1))
              / ((0.02 * (s1::DOUBLE / n / 100))
                * (0.02 * (s1::DOUBLE / n / 100)))) AS BIGINT)
              AS n_required
          FROM m""",

    "q305_bloom_fpr" -> {
      val P = 2147483647L; val a0 = 2654435761L % P
      s"""WITH t AS MATERIALIZED (SELECT doc_id, $duckToks t
           FROM documents),
          shs AS MATERIALIZED (SELECT doc_id, unnest($duckShingles3)
             sh FROM t),
          bsh AS MATERIALIZED (SELECT DISTINCT sh FROM shs
             WHERE doc_id % 97 = 0),
          bh AS (SELECT sh, (${ScoreQueries.duckPoly("sh")}) % $P h0
                 FROM bsh),
          bits AS MATERIALIZED (SELECT DISTINCT
             ((($a0 * (i + 1)) % $P) * h0 + 40503 * (i + 1))
               % $P % 1024 p
           FROM bh, (SELECT unnest(range(1, 4)) i) ii),
          probes AS MATERIALIZED (SELECT c.sh,
             (${ScoreQueries.duckPoly("c.sh")}) % $P h0
           FROM (SELECT DISTINCT sh FROM shs WHERE doc_id % 97 != 0) c
           WHERE NOT EXISTS (SELECT 1 FROM bsh WHERE bsh.sh = c.sh)),
          pp AS (SELECT sh,
             ((($a0 * (i + 1)) % $P) * h0 + 40503 * (i + 1))
               % $P % 1024 p
           FROM probes, (SELECT unnest(range(1, 4)) i) ii),
          fpc AS (SELECT CAST(count(*) AS BIGINT) n_fp FROM (
             SELECT sh FROM pp
             WHERE EXISTS (SELECT 1 FROM bits WHERE bits.p = pp.p)
             GROUP BY sh HAVING count(*) = 3) f),
          cnt AS (SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM bsh) n_inserted,
             (SELECT CAST(count(*) AS BIGINT) FROM bits) bits_set,
             (SELECT CAST(count(*) AS BIGINT) FROM probes) n_probes)
          SELECT n_inserted, bits_set, n_probes, n_fp, fpr,
            fpr_theory,
            abs(fpr - fpr_theory) <= 0.1::DOUBLE AS calibrated
          FROM (SELECT n_inserted, bits_set, n_probes, n_fp,
                  floor((n_fp::DOUBLE / n_probes) * 1e6 + 0.5) / 1e6 + 0 AS fpr,
                  floor((pow(1 - exp(-(3 * n_inserted::DOUBLE)
                    / 1024), 3)) * 1e6 + 0.5) / 1e6 + 0 AS fpr_theory
                FROM cnt CROSS JOIN fpc) z"""
    },

    "q306_rbo" ->
      """WITH r98 AS MATERIALIZED (SELECT l_partkey, rk FROM (
             SELECT l_partkey, row_number() OVER (
               ORDER BY rev DESC, l_partkey) rk
             FROM (SELECT l_partkey,
                     sum(CAST(floor((l_extendedprice * 100) * 1e0 + 0.5) / 1e0
                       AS BIGINT)) rev
                   FROM lineitem WHERE year(l_shipdate) = 1998
                   GROUP BY 1) x) y
           WHERE rk <= 50),
          r99 AS MATERIALIZED (SELECT l_partkey, rk FROM (
             SELECT l_partkey, row_number() OVER (
               ORDER BY rev DESC, l_partkey) rk
             FROM (SELECT l_partkey,
                     sum(CAST(floor((l_extendedprice * 100) * 1e0 + 0.5) / 1e0
                       AS BIGINT)) rev
                   FROM lineitem WHERE year(l_shipdate) = 1999
                   GROUP BY 1) x) y
           WHERE rk <= 50),
          c AS (SELECT CAST(greatest(r98.rk, r99.rk) AS BIGINT) d0
                FROM r98 JOIN r99 USING (l_partkey))
          SELECT CAST(50 AS BIGINT) AS k,
            CAST(count(*) AS BIGINT) AS n_common,
            floor((coalesce((1 - 0.9) * sum(list_reduce(
              list_prepend(0.0::DOUBLE,
                [pow(0.9, d - 1) / d for d in range(d0, 51)]),
              (a, b) -> a + b)), 0)) * 1e6 + 0.5) / 1e6 + 0 AS rbo
          FROM c"""
  )
}
