package graft

import org.apache.spark.sql.SparkSession

/** Partition-invariance gate (r14 verdict stretch 6).
  *
  * Rounds 12-13 proved by manual campaign (tools/compare_dumps.py,
  * two SPARK_GRAFT_CPUS settings, two scales, AQE on/off) that no
  * query's RESULT depends on partition count or reduction order. That
  * property regressed silently once before the campaign existed (the
  * round-12 q37 first-agg find), so this suite promotes a bounded
  * slice of it into every `sbt test` run: the ~30 queries built on
  * the patterns where partitioning COULD leak into results — ordered
  * windows, distributed prefix sums / global row numbers, first-in-
  * group aggregates, deterministic samplers, SCD2 reconstruction —
  * each run twice in one JVM under different shuffle-partition counts
  * and compared row-for-row.
  *
  * Two `newSession()`s off the shared context give each config its
  * own SQLConf (no cross-suite conf mutation); sf0.001 keeps the
  * whole suite inside the test wall budget (~2 runs x ~30 cheap
  * queries). Streaming queries are excluded — their state-store
  * plumbing has its own partition-invariance evidence (SCALE.md
  * round-13 campaign) and a fixed per-query cost that would blow the
  * budget here.
  */
class InvarianceSpec extends SparkSpec {

  /** Window / prefix-sum / first-agg / sampler queries — the shapes
    * where a partition-count change could reorder a reduction. */
  private val targets = Seq(
    "q13_sortperm", "q14_window_cumsum", "q15_lag_diff", "q16_rank",
    "q30_hcat", "q31_dedup_firstrow", "q37_shuffle",
    "q38_temperature_sample", "q39_mixture", "q57_pack",
    "q76_range_frame", "q82_zscore", "q103_eval_carve",
    "q108_curriculum", "q109_weighted_sample", "q116_budget_carve",
    "q121_resample_ffill", "q126_neyman_sample", "q148_revenue_gini",
    "q149_equidepth_hist", "q153_weighted_median", "q158_quantile_norm",
    "q183_last_touch", "q187_ewma", "q203_cusum", "q204_scd2",
    "q205_attribution_u", "q211_concurrency", "q214_interp_resample",
    "q225_cumulative_users", "q260_negative_sample", "q264_rfm",
    // r16: q192's median now rides a rank window — tied slopes get
    // arbitrary row_numbers across partitionings, but only slope
    // VALUES are selected, so the result must be invariant; gate it
    "q192_theilsen",
    "q323_scd2_dimension", "q333_gini_lorenz")

  /** Bit-faithful canonical form: every cell via String.valueOf
    * (Double.toString is the shortest-repr, so an invariance break at
    * any magnitude shows), rows sorted. Cells join on an explicit
    * "\\u0001" separator escape (was a raw control char, which reads
    * like mkString("") in most viewers — round-14 advice): without a
    * separator, distinct rows with shifted cell boundaries ((1, 23)
    * vs (12, 3)) would canonicalize identically and a real
    * partition-invariance break could pass silently. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .toSeq.sorted

  private def sessionWith(shufflePartitions: Int): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
    s
  }

  test("results are shuffle-partition-count invariant (8 vs 3)") {
    val s8 = sessionWith(8)
    val s3 = sessionWith(3)
    assert(s3.conf.get("spark.sql.shuffle.partitions") == "3")
    val broken = targets.flatMap { name =>
      val q = SparkEntry.queries(name)
      val a = canon(q(s8, sf))
      val b = canon(q(s3, sf))
      if (a == b) None
      else Some(s"$name: ${a.size} vs ${b.size} rows, first diff " +
        a.zip(b).collectFirst { case (x, y) if x != y => s"$x != $y" }
          .getOrElse("row-count"))
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }
}
