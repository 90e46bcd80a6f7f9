package graft

import org.apache.spark.sql.{functions => F}

/** Closed-form hand checks for the wave-7 retrieval/recommendation
  * operators — tiny inputs where the expected output is computable by
  * eye, complementing the sf-oracle parity gate.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("item CF: cosine over hand baskets, symmetric top-k") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {3,4} — c(1)=3, c(2)=3, c(3)=2,
    // c(4)=1; c12=3, c13=1, c23=1, c34=1. support>=2 keeps only (1,2):
    // sim = 3/sqrt(3*3) = 1.0 in both directions.
    val oi = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (40L, 3L), (40L, 4L)).toDF("ok", "pk")
    val ci = oi.groupBy("pk").agg(F.count(F.lit(1)).as("c"))
    val pairs = oi.toDF("ok", "i").join(oi.toDF("ok", "j"), "ok")
      .filter(F.col("i") < F.col("j"))
      .groupBy("i", "j").agg(F.count(F.lit(1)).as("cij"))
      .filter(F.col("cij") >= 2)
    val sym = pairs.unionAll(pairs.select(F.col("j").as("i"),
      F.col("i").as("j"), F.col("cij")))
    val scored = sym
      .join(ci.toDF("i", "ci"), "i").join(ci.toDF("j", "cj"), "j")
      .select(F.col("i").as("item"), F.col("j").as("rec"),
        F.round(F.col("cij")
          / F.sqrt((F.col("ci") * F.col("cj")).cast("double")), 6)
          .as("sim"))
    val out = graft.similarity.TopK
      .perGroup[Long](scored, Seq("item"), "sim", "rec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(out == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("phrase trigrams: positions tile the token stream") {
    // "a b c d" -> trigrams "a b c", "b c d"; a 2-token doc emits none
    val docs = Seq((1L, "a b  c d"), (2L, "x y")).toDF("doc_id", "text")
    val tri = docs
      .select(F.col("doc_id"), F.expr(
        """filter(split(lower(text), '\\s+'), w -> length(w) > 0)""")
        .as("ws"))
      .filter(F.size(F.col("ws")) >= 3)
      .select(F.col("doc_id"), F.explode(F.expr(
        """transform(sequence(1, size(ws) - 2),
             i -> concat_ws(' ', element_at(ws, i),
                  element_at(ws, i + 1), element_at(ws, i + 2)))"""))
        .as("phrase"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tri == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("canonical pick keeps the longest doc per cluster, id tiebreak") {
    // cluster {1,2,3} with lengths 5, 9, 9 -> keep doc 2 (9, lowest id)
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "comp")
    val chars = Seq((1L, 5L), (2L, 9L), (3L, 9L)).toDF("id", "n_chars")
    val out = comp.join(chars, "id")
      .groupBy(F.col("comp").as("cluster"))
      .agg(F.count(F.lit(1)).as("n_members"),
        F.min(F.struct((-F.col("n_chars")).as("nc"),
          F.col("id").as("d"))).as("m"))
      .select(F.col("cluster"), F.col("n_members"),
        F.col("m.d").as("kept_doc"), (-F.col("m.nc")).as("kept_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set((1L, 3L, 2L, 9L)))
  }
}
