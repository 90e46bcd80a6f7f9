package graft

import graft.queries.MetricQueries

/** Waves 33+ (closed-form estimation ops). Oracle parity is covered
  * by tools/check.py; these specs assert the invariants the hashes
  * can't see. */
class MetricSpec extends SparkSpec {

  test("q307: counts-of-counts are consistent with the totals") {
    val rows = MetricQueries.queries("q307_good_turing")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    // n_r1 of row r must equal n_r of row r+1 where both exist
    for (r <- byR.keys if byR.contains(r + 1))
      assert(byR(r).getLong(2) == byR(r + 1).getLong(1))
    val head = rows.head
    val (vocab, nTokens) = (head.getLong(4), head.getLong(5))
    assert(vocab > 0 && nTokens >= vocab)
    // chao1 can never be below the observed vocabulary
    assert(head.getDouble(7) >= vocab.toDouble)
    val unseen = head.getDouble(6)
    assert(unseen >= 0.0 && unseen <= 1.0)
  }

  test("q308: OLS recovers the bytes-per-token structure") {
    val r = MetricQueries.queries("q308_ols2")(spark, sf).collect()(0)
    val (b1, b2, r2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // bytes ≈ (avg short-word len + 1 space)·tokens + long-word
    // surcharge: both slopes positive, fit near-exact
    assert(b1 > 1.0 && b1 < 20.0)
    assert(b2 > 0.0)
    assert(r2 > 0.9 && r2 <= 1.0)
  }

  test("q308: fit is deterministic run-to-run") {
    val a = MetricQueries.queries("q308_ols2")(spark, sf).collect()(0)
    val b = MetricQueries.queries("q308_ols2")(spark, sf).collect()(0)
    assert(a == b)
  }

  test("q309: linkage scores order agreement patterns sensibly") {
    val rows = MetricQueries.queries("q309_fellegi_sunter")(spark, sf)
      .collect()
    assert(rows.length == 20)
    // top-20 is score-descending with id tie-breaks
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // more agreements can never score lower than strictly fewer,
    // since every field's agree weight exceeds its disagree weight
    val byPat = rows.groupBy(_.getString(2))
      .map { case (p, rs) => p -> rs.map(_.getDouble(3)).max }
    for {
      ("111", s3) <- byPat
      (p, s) <- byPat if p.count(_ == '1') < 3
    } assert(s3 >= s)
  }

  test("q310: reciprocal ranks are consistent with first_rank") {
    val rows = MetricQueries.queries("q310_mrr")(spark, sf).collect()
    assert(rows.length == 20)
    val mrr = rows.head.getDouble(3)
    rows.foreach { r =>
      val (fr, rr) = (r.getLong(1), r.getDouble(2))
      assert(fr >= 0 && fr <= 10)
      if (fr == 0) assert(rr == 0.0)
      else assert(math.abs(rr - 1.0 / fr) < 1e-6)
      assert(r.getDouble(3) == mrr) // scalar repeats identically
    }
    assert(math.abs(mrr - rows.map(_.getDouble(2)).sum / 20) < 1e-5)
  }

  test("q311: skyline is a mutually non-dominated staircase") {
    val rows = MetricQueries.queries("q311_skyline")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2))) // (price_cents, p_size)
    assert(rows.nonEmpty)
    // no returned point dominates another returned point
    for (a <- rows; b <- rows if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 &&
        (b._1 < a._1 || b._2 > a._2)))
    // staircase: distinct prices sorted ascending have strictly
    // increasing sizes (else the cheaper point would dominate)
    val stairs = rows.distinct.sortBy(_._1)
    stairs.zip(stairs.tail).foreach { case ((c1, s1), (c2, s2)) =>
      assert(c1 < c2 && s1 < s2)
    }
  }

  test("q312: KN probabilities are valid and discount the MLE top") {
    val rows = MetricQueries.queries("q312_kneser_ney")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (pMle, pKn) = (r.getDouble(3), r.getDouble(4))
      assert(pMle > 0.0 && pMle <= 1.0)
      assert(pKn > 0.0 && pKn <= 1.0)
    }
  }
}
