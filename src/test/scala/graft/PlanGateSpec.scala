package graft

import org.apache.spark.sql.{functions => F}

/** rt_mb tripwire as a HARD GATE (round-11 verdict task 4): the
  * PlanAudit CLI only WARNs during manual PLANS.md regeneration, so a
  * plan regression (extra shuffle, lost broadcast) between
  * regenerations could ship silently. This gate re-measures the most
  * shuffle-heavy registered queries at sf0.001 — the same sf, session
  * shape (local, 8 shuffle partitions) and listener the committed
  * PLANS.md numbers were generated with — and FAILS `sbt test` if any
  * exceeds the committed prior by the tripwire predicate (>2.5×,
  * 0.3 MiB floor). Shuffle-write bytes at a fixed sf are
  * deterministic, so this does not inherit wall-clock flakiness.
  */
class PlanGateSpec extends SparkSpec {

  // the five most shuffle-heavy queries by committed rt_shuf/rt_mb —
  // the ones where a lost broadcast costs the most at 100 TB
  private val gated = Seq("q105_source_overlap", "q106_bloom_decontam",
    "q266_lsh_recall", "q300_modularity", "q207_mutual_knn")

  private lazy val auditor = new PlanAuditor(spark)

  test("rt_mb of the shuffle-heaviest queries within 2.5x of PLANS.md") {
    val prior = PlanAudit.priorMb()
    assert(prior.nonEmpty, "PLANS.md priors missing — tripwire disabled")
    val bad = gated.flatMap { name =>
      assert(prior.contains(name), s"$name has no committed rt_mb prior")
      val fn = SparkEntry.queries(name)
      val (_, _, mb) = auditor.auditOne(sf, name, fn)
      assert(mb >= 0, s"$name errored during the audit run")
      if (PlanAudit.regressed(prior(name), mb))
        Some(f"$name: ${prior(name)}%.1f -> $mb%.1f MiB")
      else None
    }
    assert(bad.isEmpty, "rt_mb regression vs committed PLANS.md " +
      "(extra shuffle or lost broadcast; if the plan change is " +
      s"DELIBERATE, regenerate PLANS.md): ${bad.mkString("; ")}")
  }

  test("a lost broadcast trips the predicate (deliberate breakage)") {
    import spark.implicits._
    // same join, two plans: dim broadcast (healthy) vs both sides
    // shuffled (the regression the tripwire exists to catch)
    // pad must be incompressible — shuffle files are LZ4'd, and a
    // constant pad compresses below the tripwire's 0.3 MiB floor
    val big = spark.range(200000)
      .select(F.col("id"), (F.col("id") % 97).as("k"),
        F.expr("concat(hex(xxhash64(id)), hex(xxhash64(id + 1)), " +
          "hex(xxhash64(id + 2)), hex(xxhash64(id + 3)))").as("pad"))
    val dim = spark.range(97).select(F.col("id").as("k"),
      F.expr("concat('g', id % 7)").as("grp"))
    def fnOf(broken: Boolean): (org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame = { (_, _) =>
      val d = if (broken) dim.hint("shuffle_hash") else F.broadcast(dim)
      // max(pad) keeps the wide column ALIVE through the join — else
      // Catalyst prunes it before the exchange and the broken shuffle
      // carries only the 8-byte key (verified: 0.05 MiB, under floor)
      big.join(d, "k").groupBy("grp")
        .agg(F.count(F.lit(1)).as("n"), F.max("pad").as("mp"))
    }
    val (_, _, healthy) = auditor.auditOne(sf, "gate_probe_ok", fnOf(false))
    // AQE would rescue the hinted SHJ by converting it back to a
    // broadcast at runtime (dim is tiny) — disable that conversion for
    // the BROKEN run only, so the probe actually pays the shuffle a
    // lost broadcast costs
    val key = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    val broken = try {
      spark.conf.set(key, "-1")
      auditor.auditOne(sf, "gate_probe_bad", fnOf(true))._3
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    assert(healthy >= 0 && broken >= 0)
    assert(PlanAudit.regressed(healthy, broken),
      f"lost broadcast not detected: healthy=$healthy%.2f " +
        f"broken=$broken%.2f MiB")
    // and the healthy plan is NOT flagged against itself
    assert(!PlanAudit.regressed(healthy, healthy))
  }
}
