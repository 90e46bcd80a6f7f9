package graft

import org.apache.spark.sql.{functions => F}

/** Closed-form hand checks for the wave-8 funnel/report operators,
  * exercising the SAME cores the registered queries run
  * (FunnelQueries.packReport / dedupRateCurve), plus a structural
  * invariant check of the end-to-end curation funnel on the smallest
  * test corpus — complementing the sf-oracle parity gate.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("pack report counts boundary-crossing docs per source") {
    // ctx=10, doc_id order: starts 0, 5, 12, 12.
    //   doc 1: tokens [0,5)   -> bins 0..0, no cross
    //   doc 2: tokens [5,12)  -> bins 0..1, crosses
    //   doc 3: zero tokens at 12 -> no phantom cross
    //   doc 4: tokens [12,20) -> bins 1..1, no cross
    val d = Seq((1L, "s", 5L), (2L, "s", 7L), (3L, "s", 0L),
      (4L, "s", 8L)).toDF("doc_id", "source", "n_tok")
    val out = graft.queries.FunnelQueries.packReport(d, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("s", 4L, 20L, 1L, 0.25)))
  }

  test("dedup-rate curve cuts integer-exact ingest deciles") {
    // ids 0..19 -> bucket = 19/10 + 1 = 2 -> deciles 0..9, 2 docs
    // each; dups {5, 15} land in deciles 2 and 7 at rate 0.5
    val docs = (0L until 20L).map(i => (i, "s")).toDF("doc_id", "source")
    val dups = Seq(Tuple1(5L), Tuple1(15L)).toDF("doc_id")
    val out = graft.queries.FunnelQueries.dedupRateCurve(docs, dups)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val expect = (0L until 10L).map { dec =>
      if (dec == 2L || dec == 7L) (dec, 2L, 1L, 0.5)
      else (dec, 2L, 0L, 0.0)
    }.toSet
    assert(out == expect)
  }

  test("curation funnel attrition is monotone and anchored at raw") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.FunnelQueries
      .queries("q230_curation_funnel")(spark, dir)
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0 to 5))
    assert(rows.head._3 ==
      T.load(spark, dir, "documents").count())
    // each stage only removes documents
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew: ${a._3} -> ${b._3}")
    }
  }
}
