package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Distributed EXACT quantiles by iterative histogram refinement —
  * the same algorithmic family as the reference's distributed quantile
  * (iterative pivot guessing over blocks, reference
  * src/dataframe_blocks.jl:263-356), re-expressed as Catalyst
  * aggregate passes.
  *
  * Why not `percentile()`: it builds a per-partition value map whose
  * merge is O(distinct values) on ONE reducer — measured 2.9 s for a
  * single 600k-distinct column vs 0.9 s for a low-cardinality one, and
  * the merge thread only gets worse with scale. Why not a full sort:
  * a parallel sort shuffles the ENTIRE column to find 3 ranks.
  *
  * Here every pass is a codegen'd scan + tiny aggregate (≤ K×targets
  * groups shuffled), no wide shuffle, no cache:
  *   1. min/max/count per column (one agg row);
  *   2. bucket the candidate interval into K uniform bins, count per
  *      bin (one pass for ALL unresolved targets, stacked); locate the
  *      bin holding each target rank; recurse into it — each round
  *      shrinks candidates ~K×, and a bin whose min == max resolves
  *      its rank exactly (the duplicate-heavy case);
  *   3. when a target's candidate count ≤ collect limit, fetch just
  *      those values and rank-select driver-side.
  * Uniform data resolves in one refinement round. Interpolation
  * matches `percentile`/`quantile_cont` (linear between floor/ceil
  * ranks). Nulls are ignored per column; NaNs are not supported (they
  * are not ordered by < / >=). ±Infinity is supported: infinite values
  * occupy the extreme ranks by definition, so they are counted once
  * and resolved directly while refinement runs only over the finite
  * interior (interval arithmetic on an infinite bound is NaN-poisoned).
  * Bucket arithmetic is division-first in half-space, so a finite span
  * up to the full double range (hi - lo overflowing) cannot overflow.
  */
object Quantiles {

  /** Default histogram bins per refinement round. Each round shrinks a
    * target's candidate interval ~K×, so rounds ≈ log_K(n/collectLimit)
    * — 8192 gives ≤2 rounds up to ~4e12 rows. Larger K = fewer rounds
    * but a bigger (K × targets)-row histogram shuffle per pass. */
  val DefaultK = 8192
  /** Default max candidate values rank-selected driver-side. Bounds the
    * ONE driver collect at 64k doubles (~512 KB) per target group.
    * The duplicate-heavy worst case needs no special limit: a bin whose
    * min == max resolves its ranks exactly in-plan (never collected),
    * so a 10⁶-row constant column resolves in the FIRST pass —
    * adversarial test in OpsSpec. */
  val DefaultCollectLimit = 65536L
  private val MaxRounds = 64 // safety valve; ~2 rounds in practice

  /** Exact interpolated quantiles of one numeric column. */
  def exact(df: DataFrame, col: String, qs: Seq[Double]): Seq[Double] =
    exactMulti(df, Seq(col), qs)(col)

  /** One in-flight quantile: the value at fractional position `pos`
    * of column `col` needs ranks floor(pos)/ceil(pos); candidates =
    * rows passing `chain`, which are the `count` values at global
    * ranks [offset, offset+count). [lo, hi] bounds the candidates for
    * the next bucketing expression. */
  private final case class TState(
      col: String, q: Double, pos: Double,
      offset: Long, count: Long,
      lo: Double, hi: Double, chain: Column,
      vLo: Option[Double], vHi: Option[Double],
      warm: Boolean = false) {
    def rankLo: Long = math.floor(pos).toLong
    def rankHi: Long = math.ceil(pos).toLong
    def resolved: Boolean = vLo.isDefined && vHi.isDefined
    def interpolate: Double = {
      val (a, b) = (vLo.get, vHi.get)
      if (rankLo == rankHi) a else a + (pos - rankLo) * (b - a)
    }
  }

  /** Exact interpolated quantiles of several numeric columns; all
    * columns and quantiles share each refinement pass. `stats` can
    * supply precomputed (min, max, non-null count) per column to skip
    * the first pass (describe already has them). `warm` optionally
    * supplies GK bracket probe VALUES per column — `2·qs.size` doubles,
    * `(value at q₁−margin, value at q₁+margin, value at q₂−margin, …)`
    * in `qs` order, from `percentile_approx(col, …, WarmAccuracy)` —
    * piggybacked on the caller's own stats aggregate (describe does
    * this). When `stats` is not supplied, the internal stats pass
    * computes the sketch itself at no extra pass. Warm targets run
    * round 1 over their bracket with SENTINEL bins (−1 / k for values
    * outside it), so rank arithmetic stays global and a wrong bracket
    * costs one extra round, never a wrong answer — the same
    * count-verified design as the grouped engines. Because a GK
    * bracket holds ~8·n/accuracy rows, round-1 bins over it are
    * near-singleton and most ranks resolve IN the histogram pass,
    * eliminating the final collect pass (3 full scans → 2). */
  def exactMulti(df: DataFrame, cols: Seq[String], qs: Seq[Double],
                 stats: Map[String, (Double, Double, Long)] = Map.empty,
                 k: Int = DefaultK,
                 collectLimit: Long = DefaultCollectLimit,
                 warm: Map[String, Seq[Double]] = Map.empty)
      : Map[String, Seq[Double]] = {
    require(cols.nonEmpty && qs.nonEmpty)
    require(warm.values.forall(_.size == 2 * qs.size),
      s"warm probes must carry 2 values per quantile")
    val st: Map[String, (Double, Double, Long)] =
      if (cols.forall(stats.contains)) stats
      else {
        val aggs = cols.flatMap { c =>
          Seq(F.min(F.col(c).cast("double")).as(s"${c}__min"),
            F.max(F.col(c).cast("double")).as(s"${c}__max"),
            F.count(F.col(c)).as(s"${c}__n"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).first()
        cols.map { c =>
          c -> ((row.getAs[Double](s"${c}__min"),
            row.getAs[Double](s"${c}__max"), row.getAs[Long](s"${c}__n")))
        }.toMap
      }
    // Auto-sketch gate (round 12): a GK bracket pays for itself only
    // when the COLD engine needs ≥2 refinement rounds, i.e. n >
    // k·collectLimit (~5×10⁸ at the defaults) — below that, one
    // histogram round already narrows every rank under the collect
    // budget and the sketch is pure added cost (measured: q21 0.66 →
    // 1.51 s with an unconditional sketch). Past the gate, one sketch
    // pass replaces ≥1 full-data refine round AND its near-singleton
    // bracket bins usually resolve ranks without the final collect.
    val sketchCols = cols.filter { c =>
      !warm.contains(c) && st(c)._3 > k.toLong * collectLimit &&
        st(c)._1 != st(c)._2 && st(c)._1 > Double.NegativeInfinity &&
        st(c)._2 < Double.PositiveInfinity
    }
    val warmAll: Map[String, Seq[Double]] =
      if (sketchCols.isEmpty) warm
      else {
        val probeQs = qs.flatMap(q => Seq(
          math.max(0.0, q - WarmMargin), math.min(1.0, q + WarmMargin)))
        val aggs = sketchCols.map { c =>
          F.percentile_approx(F.col(c).cast("double"),
            F.array(probeQs.map(F.lit): _*), F.lit(WarmAccuracy))
            .as(s"${c}__wb")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).first()
        warm ++ sketchCols.map { c =>
          val wb = row.getAs[scala.collection.Seq[Double]](s"${c}__wb")
          c -> (if (wb == null) Seq.empty[Double] else wb.toSeq)
        }.filter(_._2.size == 2 * qs.size).toMap
      }
    cols.foreach { c =>
      require(st(c)._3 > 0, s"no non-null values in $c")
    }

    // ±Infinity pre-pass: infinite bounds poison interval bucketing
    // (hi - lo = NaN/Inf), but infinities sit at the extreme ranks by
    // definition — count them and bound the finite interior.
    val infCols = cols.filter(c => st(c)._1.isInfinite || st(c)._2.isInfinite)
    val infSt: Map[String, (Long, Long, Double, Double)] =
      if (infCols.isEmpty) Map.empty
      else {
        val aggs = infCols.flatMap { c =>
          val v = F.col(c).cast("double")
          val fin = v.between(-Double.MaxValue, Double.MaxValue)
          Seq(
            F.count(F.when(v === Double.NegativeInfinity, 1))
              .as(s"${c}__ni"),
            F.count(F.when(v === Double.PositiveInfinity, 1))
              .as(s"${c}__pi"),
            F.min(F.when(fin, v)).as(s"${c}__fmn"),
            F.max(F.when(fin, v)).as(s"${c}__fmx"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).first()
        infCols.map { c =>
          def d(f: String, dflt: Double): Double = {
            val i = row.fieldIndex(s"${c}__$f")
            if (row.isNullAt(i)) dflt else row.getDouble(i)
          }
          c -> ((row.getAs[Long](s"${c}__ni"), row.getAs[Long](s"${c}__pi"),
            d("fmn", 0.0), d("fmx", 0.0)))
        }.toMap
      }

    var states: Seq[TState] = for {
      (c, qi) <- cols.flatMap(c => qs.indices.map(c -> _))
    } yield {
      val q = qs(qi)
      val (mn, mx, n) = st(c)
      if (!infSt.contains(c)) {
        val full = F.col(c).isNotNull &&
          F.col(c).cast("double").between(mn, mx)
        val s = TState(c, q, q * (n - 1), 0L, n, mn, mx, full, None, None)
        // a constant column (or n == 1) is resolved for free
        if (mn == mx) s.copy(vLo = Some(mn), vHi = Some(mn))
        // warm bracket: interval = the GK probes, chain/offset/count
        // stay GLOBAL — round 1's sentinel bins count-verify it
        else if (n >= WarmMinN && n > collectLimit &&
          warmAll.get(c).exists(_.nonEmpty))
          s.copy(lo = warmAll(c)(2 * qi), hi = warmAll(c)(2 * qi + 1),
            warm = true)
        else s
      } else {
        val (ni, pi, fmn, fmx) = infSt(c)
        val pos = q * (n - 1)
        // ranks inside the -Inf / +Inf blocks resolve immediately
        def blockVal(rank: Long): Option[Double] =
          if (rank < ni) Some(Double.NegativeInfinity)
          else if (rank >= n - pi) Some(Double.PositiveInfinity)
          else if (fmn == fmx) Some(fmn) // constant finite interior
          else None
        val s = TState(c, q, pos, ni, n - ni - pi, fmn, fmx,
          F.col(c).isNotNull &&
            F.col(c).cast("double").between(fmn, fmx),
          None, None)
        s.copy(vLo = blockVal(s.rankLo), vHi = blockVal(s.rankHi))
      }
    }

    var rounds = 0
    while (states.exists(s => !s.resolved && s.count > collectLimit)
      && rounds < MaxRounds) {
      rounds += 1
      states = refine(df, states, k, collectLimit)
    }
    states = collectResolve(df, states)
    cols.map { c =>
      c -> qs.map(q =>
        states.find(s => s.col == c && s.q == q).get.interpolate)
    }.toMap
  }

  /** One histogram pass for every unresolved-and-too-big target.
    * Identical (col, interval) states share a histogram. */
  private def refine(df: DataFrame, states: Seq[TState],
                     k: Int, collectLimit: Long): Seq[TState] = {
    val K = k
    val active = states.filter(s => !s.resolved && s.count > collectLimit)
    if (active.isEmpty) return states
    val groups = active
      .groupBy(s =>
        (s.col, s.lo, s.hi, s.offset, s.count, s.chain.toString, s.warm))
      .toSeq
    val entries = groups.zipWithIndex.map {
      case (((col, lo, hi, _, _, _, warm), ss), tid) =>
        val v = F.col(col).cast("double")
        // half-space + division-first: (hi - lo) and (v - lo) * K can
        // overflow to Inf on a span near the full double range; the
        // half-space difference is always finite and the ratio <= 1
        // before the * K.
        val wHalf = (hi / 2 - lo / 2) / K
        val grid = F.least(F.lit(K - 1), F.greatest(F.lit(0),
          F.floor((v / 2 - F.lit(lo / 2)) / F.lit(hi / 2 - lo / 2)
            * F.lit(K)))).cast("int")
        // warm (unverified-bracket) targets keep EVERY row: values
        // outside [lo, hi] land in sentinel bins −1 / K so cum counts
        // are GLOBAL ranks; a collapsed bracket (lo == hi) maps its
        // in-range rows to bin 0 before the 0/0 grid division
        val bucket = if (!warm) grid
          else F.when(v < F.lit(lo), F.lit(-1))
            .when(v > F.lit(hi), F.lit(K))
            .otherwise(if (lo == hi) F.lit(0) else grid).cast("int")
        (tid, ss, lo, hi, wHalf,
          F.when(ss.head.chain, F.struct(F.lit(tid).as("tid"),
            bucket.as("bucket"), v.as("v"))))
    }
    val exploded = df
      .select(F.explode(F.array(entries.map(_._6): _*)).as("e"))
      .filter(F.col("e").isNotNull)
      .groupBy(F.col("e.tid").as("tid"), F.col("e.bucket").as("bucket"))
      .agg(F.count(F.lit(1)).as("cnt"), F.min("e.v").as("mn"),
        F.max("e.v").as("mx"))
      .collect()
    val hist: Map[Int, Array[(Int, Long, Double, Double)]] = exploded
      .map(r => (r.getAs[Int]("tid"), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))
      .groupBy(_._1)
      .map { case (tid, rows) =>
        tid -> rows.map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
      }
    val refined = entries.flatMap { case (tid, ss, lo, hi, wHalf, _) =>
      val bins = hist(tid)
      val cum = bins.scanLeft(0L)(_ + _._2) // rows before bins(i)
      ss.map { s =>
        // local (0-based) candidate ranks of this target
        def locate(rank: Long): (Int, Long) = { // (bin index, below-bin)
          val local = rank - s.offset
          val i = cum.lastIndexWhere(_ <= local) match {
            case j if j >= bins.length => bins.length - 1
            case j => math.max(0, math.min(j, bins.length - 1))
          }
          (i, cum(i))
        }
        def valueIfUniform(i: Int): Option[Double] = {
          val (_, _, mn, mx) = bins(i)
          if (mn == mx) Some(mn) else None
        }
        // only locate ranks that are still unresolved — a resolved
        // rank may already sit outside the narrowed interval
        val binLo = if (s.vLo.isEmpty) Some(locate(s.rankLo)._1) else None
        val binHi = if (s.vHi.isEmpty) Some(locate(s.rankHi)._1) else None
        val rLo = s.vLo.orElse(binLo.flatMap(valueIfUniform))
        val rHi = s.vHi.orElse(binHi.flatMap(valueIfUniform))
        if (rLo.isDefined && rHi.isDefined)
          s.copy(vLo = rLo, vHi = rHi)
        else {
          // narrow to the bin span of the ranks that remain unresolved
          // (adjacent bins at most, when rankHi = rankLo + 1)
          val need = Seq(if (rLo.isEmpty) binLo else None,
            if (rHi.isEmpty) binHi else None).flatten
          val iLo = need.min
          val iHi = need.max
          val bLo = bins(iLo)._1
          val bHi = bins(iHi)._1
          val newOffset = s.offset + cum(iLo)
          val newCount =
            bins.slice(iLo, iHi + 1).map(_._2).sum
          val gridOf = {
            val v = F.col(s.col).cast("double")
            F.least(F.lit(K - 1), F.greatest(F.lit(0),
              F.floor((v / 2 - F.lit(lo / 2)) / F.lit(hi / 2 - lo / 2)
                * F.lit(K)))).cast("int")
          }
          // membership predicate = EXACTLY the bucket expression this
          // round's histogram used (sentinel form for warm targets)
          val bucketOf = if (!s.warm) gridOf
            else {
              val v = F.col(s.col).cast("double")
              F.when(v < F.lit(lo), F.lit(-1))
                .when(v > F.lit(hi), F.lit(K))
                .otherwise(if (lo == hi) F.lit(0) else gridOf).cast("int")
            }
          // Interval for the next round's grid. Non-warm: grid
          // arithmetic with a one-bin margin on each side keeps the
          // range a superset of the chain-selected values under float
          // rounding (membership itself is exactly the bucket
          // predicate); computed in half-space and doubled so nothing
          // overflows for finite lo/hi — an overflow at the very edge
          // lands on ±Inf and the clamps pull it back to the old
          // bound. Warm: sentinel bins (−1 / K) have no grid
          // coordinates, so use the selected bins' OBSERVED value
          // bounds — exact data values, trivially a superset of the
          // selected rows.
          val (newLo, newHi) = if (s.warm)
            (bins(iLo)._3, bins(iHi)._4)
          else
            (math.max(lo, 2 * (lo / 2 + (bLo - 1) * wHalf)),
              math.min(hi, 2 * (lo / 2 + (bHi + 2) * wHalf)))
          s.copy(
            offset = newOffset, count = newCount,
            lo = newLo, hi = newHi,
            chain = s.chain && bucketOf.between(bLo, bHi),
            vLo = rLo, vHi = rHi,
            warm = false)
        }
      }
    }
    val refinedKeys = refined.map(s => (s.col, s.q)).toSet
    states.filterNot(s => refinedKeys.contains((s.col, s.q))) ++ refined
  }

  /** Fetch every remaining target's candidate values (bounded by
    * the collect limit each) in one pass and rank-select driver-side. */
  private def collectResolve(df: DataFrame,
                             states: Seq[TState]): Seq[TState] = {
    val pending = states.filterNot(_.resolved)
    if (pending.isEmpty) return states
    val groups = pending
      .groupBy(s => (s.col, s.chain.toString)).toSeq
    val entries = groups.zipWithIndex.map { case ((_, ss), tid) =>
      (tid, ss,
        F.when(ss.head.chain, F.struct(F.lit(tid).as("tid"),
          F.col(ss.head.col).cast("double").as("v"))))
    }
    val rows = df
      .select(F.explode(F.array(entries.map(_._3): _*)).as("e"))
      .filter(F.col("e").isNotNull)
      .select(F.col("e.tid"), F.col("e.v"))
      .collect()
    val byTid = rows.groupBy(_.getInt(0))
    val resolved = entries.flatMap { case (tid, ss, _) =>
      val sortedVals = byTid.getOrElse(tid, Array.empty)
        .map(_.getDouble(1)).sorted
      ss.map { s =>
        def at(rank: Long): Double = sortedVals((rank - s.offset).toInt)
        s.copy(vLo = s.vLo.orElse(Some(at(s.rankLo))),
          vHi = s.vHi.orElse(Some(at(s.rankHi))))
      }
    }
    val doneKeys = resolved.map(s => (s.col, s.q)).toSet
    states.filterNot(s => doneKeys.contains((s.col, s.q))) ++ resolved
  }

  /** GROUPED exact interpolated quantile of an integer (long) column —
    * the scale path for the "grouped exact percentile" bottleneck
    * documented in SCALE.md: `percentile()` merges a per-partition
    * value map that is O(distinct values per group) on one reducer,
    * and a per-group sort shuffles the whole column. This runs the
    * same iterative histogram refinement as [[exactMulti]] but keeps
    * ALL per-group search state IN THE PLAN — a (group, rank-target,
    * lo, hi, offset) relation that narrows ~k× per round — so a
    * billion groups cost zero driver memory; the driver only sees one
    * "any interval still open?" count per round (the q24/CC loop
    * discipline). Integer domains terminate WITHOUT any value
    * collect: once an interval's width is below k every bin is a
    * single value, so each rank resolves to `lo` exactly —
    * ceil(log_k(range)) + 1 rounds total (3-4 for cent values).
    *
    * Returns one row per group: key columns + `out` (double,
    * interpolated between floor/ceil ranks exactly like
    * `percentile`/`quantile_cont`). Nulls in `valCol` are ignored;
    * empty groups don't appear (no non-null values = no row).
    */
  def groupedExactLong(df: DataFrame, keys: Seq[String], valCol: String,
                       q: Double, out: String,
                       k: Int = 4096, pinned: Boolean = false): DataFrame =
    groupedExactLongMulti(df, keys, valCol, Seq(q -> out), k, pinned)

  /** Multi-target sibling of [[groupedExactLong]]: resolves SEVERAL
    * quantiles of the same grouped column through ONE shared
    * refinement loop. The per-round histogram join already carries
    * one rank row per open (group, rank) target, so adding a target
    * adds O(groups) rank-state rows — NOT extra passes over the data.
    * A 3-quantile profile (p05/p50/p95) costs the same number of
    * full-data scans as a single median. Duplicate ranks across
    * targets (p50's ceil == p90's floor in a small group) dedup in
    * the shared rank state. `qs` maps each quantile to its output
    * column name; interpolation per target is `lo + (q(n−1) − ⌊q(n−1)⌋) ·
    * (hi − lo)` — like quantile_cont, within one ulp of
    * `percentile`'s (1−g)·lo + g·hi form.
    */
  /** GK warm-start knobs (round-11 verdict task 1). The init
    * aggregation also runs one `percentile_approx` sketch per call —
    * Greenwald-Khanna, deterministic rank error ≤ n/accuracy — probing
    * each target quantile ± `WarmMargin`. The two probe VALUES bracket
    * the target's true floor/ceil ranks whenever 3·(n/accuracy) covers
    * the probe-vs-rank slack, i.e. n ≳ accuracy; below [[WarmMinN]]
    * the bracket is not attempted (min/max init is near-free there).
    * The bracket is a PERFORMANCE hint only: round 1 count-verifies it
    * with sentinel bins (values outside [lo, hi] land in bins −1 / k,
    * so a rank falling outside the bracket narrows to the outside
    * region and the loop continues) — a wrong bracket costs one extra
    * round, never a wrong answer, and a collapsed bracket (aLo == aHi)
    * is still verified because `__warm` states must survive one round
    * before they can close. Typical effect: the bracket holds
    * ~8·n/accuracy rows, so round 1's k bins are already single values
    * (long domains) or already under the endgame budget (double
    * domains) — 3-4 full-data rounds collapse to 1. */
  val WarmAccuracy = 1000
  val WarmMargin: Double = 4.0 / WarmAccuracy
  val WarmMinN = 2000L

  /** The grouped engines hint `broadcast()` on every state-side join —
    * the state relation is lazily planned (no stats), so without the
    * hint Spark picks an SMJ that re-shuffles the FULL data relation
    * every refinement round (the single biggest constant found in the
    * round-11 warm-start work). But the state is O(groups × targets)
    * rows, and these are PUBLIC entry points: a high-cardinality group
    * key must not force a driver-side broadcast each round (driver OOM
    * at the 100 TB scale this engine targets — round-12 ADVICE). The
    * hint is therefore gated on the init row count (already computed:
    * init is checkpointed before the loop); past the bound the joins
    * fall back to the planner's shuffle join, which is the right plan
    * at that cardinality anyway. ~4M state rows ≈ a few hundred MB
    * broadcast — comfortably under executor memory, far under driver
    * OOM territory. */
  val BroadcastStateMaxRows: Long = 4L * 1000 * 1000

  /** Shared grouped-refinement setup: the pinned (keys, __v)
    * projection, the CHECKPOINTED per-group init row (n, per-target
    * floor/ceil ranks, min/max, GK warm probes — O(groups), reused by
    * the final interpolation so the data is never re-aggregated) and
    * the initial rank-state rows (one per distinct rank across all
    * targets; warm-bracketed where the GK guarantee holds). `castType`
    * is the only long-vs-double difference at this stage. `pinned`
    * callers guarantee `df` is already materialized (localCheckpoint)
    * so re-deriving the projection per round is an in-memory scan —
    * used by q69's two sequential engine passes to share ONE pin. */
  private def groupedInit(df: DataFrame, keys: Seq[String],
      valCol: String, qs: Seq[(Double, String)], castType: String,
      pinned: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    require(keys.nonEmpty && qs.nonEmpty &&
      qs.forall { case (q, _) => q >= 0 && q <= 1 })
    val kCols = keys.map(F.col)
    val proj = df.select(kCols :+ F.col(valCol).cast(castType).as("__v"): _*)
      .filter(F.col("__v").isNotNull)
    val data = if (pinned) proj
      else proj.localCheckpoint() // read once per refinement round
    val rkExprs = qs.zipWithIndex.flatMap { case ((q, _), i) =>
      Seq(F.expr(s"cast(floor($q * (__n - 1)) as bigint)")
          .as(s"__rkLo$i"),
        F.expr(s"cast(ceil($q * (__n - 1)) as bigint)").as(s"__rkHi$i"))
    }
    // 2 probes per target: value at quantile q∓margin (clamped). GK
    // guarantees rank(probe) within n·margin∓n/accuracy of the target
    // rank, so [probe_lo, probe_hi] ⊇ the target's value for n ≥
    // WarmMinN — and round 1 verifies it by count regardless.
    val probes = qs.flatMap { case (q, _) =>
      Seq(math.max(0.0, q - WarmMargin), math.min(1.0, q + WarmMargin))
    }
    val init = data.groupBy(kCols: _*)
      .agg(F.count(F.lit(1)).as("__n"),
        F.min("__v").as("__lo"), F.max("__v").as("__hi"),
        F.percentile_approx(F.col("__v"),
          F.array(probes.map(F.lit): _*), F.lit(WarmAccuracy)).as("__wb"))
      .select((kCols ++ Seq(F.col("__n")) ++ rkExprs ++
        Seq(F.col("__lo"), F.col("__hi"), F.col("__wb"))): _*)
      // LAZY: stateHint's gate count (always the next action, both
      // engines) materializes it — ckpt+count fused to one job (r15;
      // the eager form paid a separate materialization job per call)
      .localCheckpoint(false) // O(groups) rows; reused by interpTargets
    val allRk = F.array_distinct(F.array(qs.indices.flatMap(i =>
      Seq(F.col(s"__rkLo$i"), F.col(s"__rkHi$i"))): _*))
    val rkCols = qs.indices.flatMap(i =>
      Seq(F.col(s"__rkLo$i"), F.col(s"__rkHi$i")))
    val exploded = init
      .select((kCols ++ rkCols ++ Seq(F.col("__n"), F.col("__lo"),
        F.col("__hi"), F.col("__wb"), F.explode(allRk).as("__rk"))): _*)
    // a rank shared by several targets takes the ENVELOPE of their
    // brackets (least/greatest skip the null non-owner branches; the
    // trailing typed null only satisfies the ≥2-arg arity for a
    // single-target call)
    val nullV = F.lit(null).cast(castType)
    val wLo = F.least(qs.indices.flatMap(i => Seq(
      F.when(F.col("__rk") === F.col(s"__rkLo$i")
        || F.col("__rk") === F.col(s"__rkHi$i"),
        F.element_at(F.col("__wb"), 2 * i + 1)))) :+ nullV: _*)
    val wHi = F.greatest(qs.indices.flatMap(i => Seq(
      F.when(F.col("__rk") === F.col(s"__rkLo$i")
        || F.col("__rk") === F.col(s"__rkHi$i"),
        F.element_at(F.col("__wb"), 2 * i + 2)))) :+ nullV: _*)
    val warm = F.col("__n") >= WarmMinN &&
      wLo.isNotNull && wHi.isNotNull
    val state0 = exploded
      .select((kCols ++ Seq(F.col("__n"), F.col("__rk"),
        F.lit(0L).as("__off"),
        F.when(warm, wLo).otherwise(F.col("__lo")).as("__lo"),
        F.when(warm, wHi).otherwise(F.col("__hi")).as("__hi"),
        warm.as("__warm"))): _*)
    (data, init, state0)
  }

  /** Broadcast-or-identity for the state-side joins: hint only while
    * the worst-case state row count (groups × 2 ranks per target) is
    * under [[BroadcastStateMaxRows]]. `init` is checkpointed, so the
    * count is an in-memory O(groups) scan, paid once per engine call. */
  private def stateHint(init: DataFrame,
      targets: Int): DataFrame => DataFrame =
    if (init.count() * 2L * targets <= BroadcastStateMaxRows)
      F.broadcast
    else identity

  def groupedExactLongMulti(df: DataFrame, keys: Seq[String],
                            valCol: String, qs: Seq[(Double, String)],
                            k: Int = 4096,
                            pinned: Boolean = false): DataFrame = {
    val kCols = keys.map(F.col)
    val (data, init, state0) =
      groupedInit(df, keys, valCol, qs, "long", pinned)
    val hintState = stateHint(init, qs.size)
    // state0 is a select+explode over the checkpointed init —
    // re-deriving it per reference is O(groups), so it is NOT
    // checkpointed and the pre-loop open count is skipped: round 1
    // always runs (warm states must verify anyway; a workload whose
    // state0 is fully closed pays one empty join — trivial)
    var state = state0
    // a warm (GK-bracketed) state must survive one count-verifying
    // round before it may close — its interval was never witnessed
    val openCond = F.col("__warm") || F.col("__hi") > F.col("__lo")
    var open = -1L // unknown until a round has counted
    var rounds = 0
    while (open != 0 && rounds < MaxRounds) {
      val done = state.filter(!openCond)
      val pending = state.filter(openCond)
      // bucket the open intervals: k uniform integer bins; width ≤ k
      // means every bin is one value and next round closes the
      // interval. The bin arithmetic runs in DECIMAL(38,0): in int64,
      // (v−lo)·k wraps once a group's span exceeds 2^63/k (~9e15 for
      // k=1024) and hi−lo+1 itself wraps near the full long range — a
      // wrapped bin silently drops the rank row and the group vanishes.
      // Decimal multiply/int-divide is exact for the full long domain
      // ((2^64)·1024 ≈ 1.9e22 ≪ 10^38) and costs one codegen'd decimal
      // op per row per round — noise next to the join it rides on.
      // Warm states keep EVERY row of the group: values outside the
      // unverified bracket land in sentinel bins −1 / k, so the cum
      // counts are global and the rank's true bin is found whether or
      // not the bracket was right. Verified states filter to their
      // witnessed interval exactly as before (no sentinel rows).
      val binned = data.join(hintState(pending), keys)
        .filter(F.col("__warm") || (F.col("__v") >= F.col("__lo") &&
          F.col("__v") <= F.col("__hi")))
        .withColumn("__bin",
          F.when(F.col("__v") < F.col("__lo"), F.lit(-1L))
            .when(F.col("__v") > F.col("__hi"), F.lit(k.toLong))
            .otherwise(F.expr(
              s"""cast(((cast(__v as decimal(38,0)) - __lo) * $k)
                  div (cast(__hi as decimal(38,0)) - __lo + 1)
                  as bigint)""")))
        .groupBy((kCols ++ Seq(F.col("__rk"), F.col("__bin"))): _*)
        .agg(F.count(F.lit(1)).as("__c"),
          F.min("__v").as("__bmin"), F.max("__v").as("__bmax"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((kCols :+ F.col("__rk")): _*).orderBy("__bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1) // ≤k+2 rows per (group, rk)
      val next = binned
        .withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0L)))
        .join(hintState(pending.select((kCols ++ Seq(F.col("__rk"),
          F.col("__n"), F.col("__off"))): _*)), keys :+ "__rk")
        // the bin holding local rank (__rk − __off); for warm states
        // __off = 0 and the sentinel bins make __cb global, so the
        // same arithmetic verifies the bracket by count
        .filter(F.col("__rk") - F.col("__off") >= F.col("__cb") &&
          F.col("__rk") - F.col("__off") < F.col("__cb") + F.col("__c"))
        .select((kCols ++ Seq(F.col("__n"), F.col("__rk"),
          (F.col("__off") + F.col("__cb")).as("__off"),
          F.col("__bmin").as("__lo"), F.col("__bmax").as("__hi"),
          F.lit(false).as("__warm"))): _*)
      val prev = state
      // LAZY checkpoint: the open count scans every state partition,
      // so the checkpoint materializes inside the count job — one job
      // per round where ckpt+count used to be two (round 12). The
      // superseded round releases only after that job has pinned its
      // successor (the GraftReleaseBridge ordering contract).
      state = done.unionByName(next).localCheckpoint(false)
      open = state.filter(openCond).count()
      org.apache.spark.sql.GraftReleaseBridge.release(prev)
      rounds += 1
      if (sys.env.contains("GRAFT_QUANTILE_DEBUG"))
        System.err.println(s"[quantiles] round=$rounds open=$open " +
          s"targets=${qs.size} t=${System.nanoTime() / 1000000}")
    }
    require(open == 0, s"grouped quantile did not converge in $MaxRounds rounds")
    val res = state.select((kCols ++ Seq(F.col("__rk"),
      F.col("__lo").as("__val"))): _*)
    interpTargets(init, res, keys, qs)
  }

  /** Shared final pivot: fold the resolved-rank relation to ONE
    * rank→value map row per group and join it to init once —
    * 2 aggregation-shuffle ops total, independent of target count
    * (round 11; the previous 2-joins-per-target shape planned 8 joins
    * for a 4-quantile profile). Both relations are O(groups) rows;
    * every floor/ceil lookup is an element_at on the map. */
  private def interpTargets(init: DataFrame, res: DataFrame,
      keys: Seq[String], qs: Seq[(Double, String)]): DataFrame = {
    val kCols = keys.map(F.col)
    val rkMap = res.groupBy(kCols: _*)
      .agg(F.map_from_entries(
        F.collect_list(F.struct(F.col("__rk"), F.col("__val"))))
        .as("__rkv"))
    val out = init.drop("__lo", "__hi", "__wb").join(rkMap, keys)
    val outCols = qs.zipWithIndex.map { case ((q, name), i) =>
      F.expr(
        s"""cast(element_at(__rkv, __rkLo$i) as double)
            + ($q * (__n - 1) - __rkLo$i)
            * (cast(element_at(__rkv, __rkHi$i) as double)
               - element_at(__rkv, __rkLo$i))""").as(name)
    }
    out.select((kCols ++ outCols): _*)
  }

  /** GROUPED exact interpolated quantiles of a DOUBLE column — the
    * float-domain sibling of [[groupedExactLongMulti]] (verdict r8/r9
    * task: latency/score columns are doubles, and their fallback was
    * the native `percentile` this engine exists to retire). Same
    * in-plan (group, rank, lo, hi, offset) search state narrowing ~k×
    * per round, with two float-specific differences:
    *
    *   - bin arithmetic is the half-space division-first form from
    *     [[exactMulti]] (a span near the full double range overflows
    *     (hi−lo) and (v−lo)·k to Inf; halves and a ≤1 ratio cannot);
    *   - float domains have no integer-bin exhaustion, so targets
    *     whose candidate count drops to ≤`endgame` leave the loop and
    *     resolve by an IN-PLAN per-(group, rank) sort of just their
    *     candidate rows — a window partitioned by (keys, rank), ≤
    *     `endgame` rows per partition, distributed across groups
    *     (zero driver collects, zero single-partition exchanges; the
    *     batched replacement for exactMulti's driver-side endgame).
    *     Duplicate-heavy groups still close in-loop via bmin == bmax.
    *
    * Interpolation matches [[groupedExactLongMulti]] (quantile_cont's
    * `lo + g·(hi − lo)`, within one ulp of native `percentile`).
    * Nulls ignored; NaN and ±Infinity unsupported (NaN is unordered
    * by </>=; an infinite interval bound poisons bin arithmetic —
    * same contract as [[exactMulti]] documents for NaN).
    */
  def groupedExactDoubleMulti(df: DataFrame, keys: Seq[String],
                              valCol: String, qs: Seq[(Double, String)],
                              k: Int = 4096,
                              endgame: Int = 4096,
                              pinned: Boolean = false): DataFrame = {
    val kCols = keys.map(F.col)
    val (data, init, state0) =
      groupedInit(df, keys, valCol, qs, "double", pinned)
    val hintState = stateHint(init, qs.size)
    // lazy state0 + unconditional round 1: see groupedExactLongMulti
    var state = state0.withColumn("__cnt", F.col("__n"))
    // a target refines while its interval is non-degenerate AND its
    // candidate count exceeds the in-plan endgame budget; a warm
    // (GK-bracketed) target must survive one count-verifying round
    // regardless — its interval and __off were never witnessed, so
    // neither the close-on-degenerate nor the endgame may trust them
    val openCond = F.col("__warm") || (F.col("__hi") > F.col("__lo") &&
      F.col("__cnt") > endgame)
    var open = -1L // unknown until a round has counted
    var rounds = 0
    while (open != 0 && rounds < MaxRounds) {
      val done = state.filter(!openCond)
      val pending = state.filter(openCond)
      // warm states keep every row (sentinel bins −1 / k outside the
      // bracket — see groupedExactLongMulti); the `lo == hi` guard
      // keeps a collapsed bracket's in-range rows out of the 0/0
      // half-space division (they are all exactly lo → bin 0)
      val binned = data.join(hintState(pending), keys)
        .filter(F.col("__warm") || (F.col("__v") >= F.col("__lo") &&
          F.col("__v") <= F.col("__hi")))
        .withColumn("__bin",
          F.when(F.col("__v") < F.col("__lo"), F.lit(-1L))
            .when(F.col("__v") > F.col("__hi"), F.lit(k.toLong))
            .when(F.col("__lo") === F.col("__hi"), F.lit(0L))
            .otherwise(F.least(F.lit((k - 1).toLong),
              F.greatest(F.lit(0L),
                F.floor((F.col("__v") / 2 - F.col("__lo") / 2)
                  / (F.col("__hi") / 2 - F.col("__lo") / 2) * k)))))
        .groupBy((kCols ++ Seq(F.col("__rk"), F.col("__bin"))): _*)
        .agg(F.count(F.lit(1)).as("__c"),
          F.min("__v").as("__bmin"), F.max("__v").as("__bmax"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((kCols :+ F.col("__rk")): _*).orderBy("__bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1) // ≤k rows per (group, rk)
      val next = binned
        .withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0L)))
        .join(hintState(pending.select((kCols ++ Seq(F.col("__rk"),
          F.col("__n"), F.col("__off"))): _*)), keys :+ "__rk")
        .filter(F.col("__rk") - F.col("__off") >= F.col("__cb") &&
          F.col("__rk") - F.col("__off") < F.col("__cb") + F.col("__c"))
        .select((kCols ++ Seq(F.col("__n"), F.col("__rk"),
          (F.col("__off") + F.col("__cb")).as("__off"),
          F.col("__bmin").as("__lo"), F.col("__bmax").as("__hi"),
          F.lit(false).as("__warm"),
          F.col("__c").as("__cnt"))): _*)
      val prev = state
      // LAZY checkpoint: the open count scans every state partition,
      // so the checkpoint materializes inside the count job — one job
      // per round where ckpt+count used to be two (round 12). The
      // superseded round releases only after that job has pinned its
      // successor (the GraftReleaseBridge ordering contract).
      state = done.unionByName(next).localCheckpoint(false)
      open = state.filter(openCond).count()
      org.apache.spark.sql.GraftReleaseBridge.release(prev)
      rounds += 1
      if (sys.env.contains("GRAFT_QUANTILE_DEBUG"))
        System.err.println(s"[quantiles] round=$rounds open=$open " +
          s"targets=${qs.size} t=${System.nanoTime() / 1000000}")
    }
    require(open == 0,
      s"grouped double quantile did not converge in $MaxRounds rounds")
    // closed in-loop (bmin == bmax): the rank's value is the interval
    val closed = state.filter(F.col("__hi") <= F.col("__lo"))
      .select((kCols ++ Seq(F.col("__rk"), F.col("__lo").as("__val"))): _*)
    // in-plan endgame: each narrow-but-unclosed target sorts ONLY its
    // ≤endgame candidate rows, partitioned by (keys, rank) — no
    // driver collect, no single-partition exchange
    val narrow = state.filter(F.col("__hi") > F.col("__lo"))
      .select((kCols ++ Seq(F.col("__rk"), F.col("__off"),
        F.col("__lo"), F.col("__hi"))): _*)
    val ew = org.apache.spark.sql.expressions.Window
      .partitionBy((kCols :+ F.col("__rk")): _*).orderBy("__v")
    val endRows = data.join(hintState(narrow), keys)
      .filter(F.col("__v") >= F.col("__lo") &&
        F.col("__v") <= F.col("__hi"))
      .withColumn("__rn",
        F.row_number().over(ew).cast("long") - 1L)
      .filter(F.col("__rn") === F.col("__rk") - F.col("__off"))
      .select((kCols ++ Seq(F.col("__rk"), F.col("__v").as("__val"))): _*)
    interpTargets(init, closed.unionByName(endRows), keys, qs)
  }
}
