package graft

import graft.plans.GraftExtensions

/** SQL-surface registration of the custom expressions. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions plan and evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_erf(1.0) AS e, graft_erfc(1.0) AS ec,
                graft_digamma(2.0) AS d, graft_lgamma(5.0) AS g,
                graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
                graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dp,
                graft_vec_norm(array(3.0f, 4.0f)) AS n""").first()
    assert(math.abs(r.getAs[Double]("e") - 0.8427007929) < 1e-6)
    assert(math.abs(r.getAs[Double]("e") + r.getAs[Double]("ec") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("g") - math.log(24.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("dp") - 11.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("n") - 5.0) < 1e-12)
  }

  test("text + zorder SQL functions plan and evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_tokens('The quick  fox!') AS t,
                graft_shingles('a b c d', 2) AS sh,
                graft_packed_trigrams('abc') AS tri,
                graft_zvalue(3L, 1L) AS z""").first()
    assert(r.getSeq[String](0) == Seq("the", "quick", "fox"))
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
    val packed = (('a'.toLong << 42) | ('b'.toLong << 21) | 'c'.toLong)
    assert(r.getSeq[Long](2) == Seq(packed))
    // interleave(3, 1): a bits at even positions (1|4), b bit0 at pos 1
    assert(r.getLong(3) == ((1L | 4L) | 2L))
  }

  test("functions work inside a whole query plan over a table") {
    GraftExtensions.register(spark)
    T.load(spark, sf, "embeddings").createOrReplaceTempView("emb_v")
    val out = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS s
         FROM emb_v a JOIN emb_v b ON b.vec_id = a.vec_id""")
    // self-cosine = 1
    assert(out.filter("abs(s - 1.0) > 1e-6").count() == 0)
  }
}
