package graft

import org.apache.spark.sql.{functions => F}

/** Closed-form hand checks for the wave-7 retrieval/recommendation
  * operators, exercising the SAME code the registered queries run
  * (RetrievalQueries.itemCf / phraseTrigrams,
  * PipelineQueries.canonicalPick) — tiny inputs where the expected
  * output is computable by eye, complementing the sf-oracle parity
  * gate.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("item CF: cosine over hand baskets, symmetric top-k") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {3,4} — c(1)=3, c(2)=3, c(3)=2,
    // c(4)=1; c12=3, c13=1, c23=1, c34=1. support>=2 keeps only (1,2):
    // sim = 3/sqrt(3*3) = 1.0 in both directions.
    val oi = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (40L, 3L), (40L, 4L)).toDF("ok", "pk")
    val out = graft.queries.RetrievalQueries
      .itemCf(oi, minSupport = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(out == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("phrase trigrams: positions tile the token stream") {
    // "a b c d" -> trigrams "a b c", "b c d"; a 2-token doc emits none
    val docs = Seq((1L, "a b  c d"), (2L, "x y")).toDF("doc_id", "text")
    val tri = graft.queries.RetrievalQueries.phraseTrigrams(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tri == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("canonical pick keeps the longest doc per cluster, id tiebreak") {
    // cluster {1,2,3} with lengths 5, 9, 9 -> keep doc 2 (9, lowest id)
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "comp")
    val chars = Seq((1L, 5L), (2L, 9L), (3L, 9L)).toDF("id", "n_chars")
    val out = graft.queries.PipelineQueries.canonicalPick(comp, chars)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set((1L, 3L, 2L, 9L)))
  }
}
