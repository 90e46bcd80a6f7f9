package graft

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._
import graft.ops.RelOps._
import graft.ops.TypedOps._

/** Closure escape hatches + join-key inference + reference join
  * semantics (duplicate-key cartesian expansion, src/merge.jl:56-63).
  */
class TypedOpsSpec extends SparkSpec {

  test("byClosure: per-group arbitrary function emitting N rows") {
    val o = T.load(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice")
    val schema = StructType(Seq(
      StructField("status", StringType),
      StructField("which", StringType),
      StructField("price", DoubleType)))
    // min & max row per group as two output rows (not expressible as a
    // single scalar agg — the reference's group→DataFrame form)
    val out = o.byClosure("o_orderstatus", schema) { (k, it) =>
      val prices = it.map(_.getAs[Double]("o_totalprice")).toVector
      Iterator(Row(k, "min", prices.min), Row(k, "max", prices.max))
    }
    val viaAgg = o.groupBy("o_orderstatus").agg(
      F.min("o_totalprice").as("mn"), F.max("o_totalprice").as("mx"))
    val joined = out.groupBy("status")
      .pivot("which", Seq("min", "max")).agg(F.first("price"))
      .join(viaAgg, F.col("status") === F.col("o_orderstatus"))
      .filter(F.col("min") =!= F.col("mn") || F.col("max") =!= F.col("mx"))
    assert(joined.count() == 0)
  }

  test("mapRows: typed row iteration") {
    import spark.implicits._
    val n = T.load(spark, sf, "region")
      .mapRows(r => r.getAs[String]("r_name").length)
      .collect().sum
    val direct = T.load(spark, sf, "region")
      .agg(F.sum(F.length(F.col("r_name")))).first().getLong(0)
    assert(n.toLong == direct)
  }

  test("joinAuto uses the first common column") {
    val o = T.load(spark, sf, "orders")
    val c = T.load(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val j = o.joinAuto(c) // first common col = o_custkey
    assert(j.count() == o.count()) // every order has a customer
    intercept[IllegalArgumentException] {
      T.load(spark, sf, "region").joinAuto(T.load(spark, sf, "part"))
    }
  }

  test("duplicate join keys produce the full MxN cartesian per key") {
    import spark.implicits._
    val l = Seq((1, "a1"), (1, "a2"), (2, "b")).toDF("k", "lv")
    val r = Seq((1, "x"), (1, "y"), (3, "z")).toDF("k", "rv")
    val j = l.join(r, Seq("k"), "inner")
    assert(j.count() == 4) // 2x2 for k=1 (reference src/merge.jl:56-63)
    val outer = l.join(r, Seq("k"), "full_outer")
    assert(outer.count() == 6) // 4 + left-only k=2 + right-only k=3
    assert(outer.filter(F.col("rv").isNull).count() == 1)
    assert(outer.filter(F.col("lv").isNull).count() == 1)
  }

  test("flipud reverses under the explicit key; cleanColnames sanitizes") {
    val r = T.load(spark, sf, "region")
    val fl = r.flipud("r_regionkey").collect().map(_.getAs[Int]("r_regionkey"))
    assert(fl.toSeq == fl.toSeq.sorted.reverse)
    import spark.implicits._
    val dirty = Seq((1, 2)).toDF("a b", "c-d!")
    assert(dirty.cleanColnames().columns.toSeq == Seq("a_b", "c_d_"))
  }
}
