package graft

import org.apache.spark.sql.{functions => F}
import graft.ops.RelOps._
import graft.ops.SeqOps._
import graft.ops.Skew

/** Direct mirrors of the reference's OWN test queries (reference
  * test/grouping.jl, test/sort.jl, test/duplicates.jl,
  * test/operators.jl) re-expressed on the graft API — "a user of the
  * reference could switch and run every query they run today".
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  // reference test/grouping.jl:6 — df = DataFrame(a=rep(1:4,2),
  // b=rep(2:-1:1,4), c=randn(8)); deterministic c here.
  private def groupingDf = {
    val a = (1 to 4) ++ (1 to 4)
    val b = Seq(2, 1, 2, 1, 2, 1, 2, 1)
    val c = (1 to 8).map(i => math.sin(i.toDouble)) // fixed "randn"
    a.zip(b).zip(c).map { case ((x, y), z) => (x, y, z) }.toDF("a", "b", "c")
  }

  test("grouping.jl: by-keys equal unique sorted keys") {
    // @test isequal(bdf[cols], unique(sdf[cols])) (test/grouping.jl:15)
    val df = groupingDf
    val bdf = df.by(Seq("a", "b"), "cmax" -> "max(c)")
      .select("a", "b").orderBy("a", "b").collect()
    val uniq = df.sortBy(Ordering("a"), Ordering("b"))
      .select("a", "b").distinct().orderBy("a", "b").collect()
    assert(bdf.toSeq == uniq.toSeq)
  }

  test("grouping.jl: expression form equals closure form") {
    // bye = by(df,"a",:(bsum=sum(b))) vs byf = by(df,"a",df->...)
    // (test/grouping.jl:18-21)
    import graft.ops.TypedOps._
    import org.apache.spark.sql.types._
    val df = groupingDf
    val bye = df.by(Seq("a"), "bsum" -> "sum(b)")
      .orderBy("a").collect().map(r => r.getInt(0) -> r.getLong(1))
    val schema = StructType(Seq(StructField("a", IntegerType),
      StructField("bsum", LongType)))
    val byf = df.byClosure("a", schema) { (k, it) =>
      Iterator(org.apache.spark.sql.Row(k.toInt,
        it.map(_.getAs[Int]("b").toLong).sum))
    }.orderBy("a").collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(bye.toSeq == byf.toSeq)
  }

  // reference test/sort.jl:7 — dv1 = [9, 1, 8, NA, 3, 3, 7, NA]
  private def sortDf = Seq[(Option[Int], Int)](
    (Some(9), 1), (Some(1), 2), (Some(8), 3), (None, 4),
    (Some(3), 5), (Some(3), 6), (Some(7), 7), (None, 8)
  ).toDF("dv1", "dv3")

  test("sort.jl: NAs sort first ascending; int and float orders agree") {
    val byInt = sortDf.sortBy(Ordering("dv1"), Ordering("dv3"))
      .select("dv3").collect().map(_.getInt(0)).toSeq
    // NA rows (4, 8) first, then 1,2 (v=1), 5,6 (v=3), 7 (v=7), 3 (v=8), 1 (v=9)
    assert(byInt == Seq(4, 8, 2, 5, 6, 7, 3, 1))
    val byFlt = sortDf.withColumn("dv2", F.col("dv1").cast("double"))
      .sortBy(Ordering("dv2"), Ordering("dv3"))
      .select("dv3").collect().map(_.getInt(0)).toSeq
    assert(byInt == byFlt) // sortperm(dv1) == sortperm(dv2)
  }

  test("sort.jl: rev=true puts NAs last; multi-key mixed directions") {
    val rev = sortDf.sortBy(Ordering("dv1", desc = true), Ordering("dv3"))
      .select("dv1").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(rev.takeWhile(_.isDefined).map(_.get) ==
      Seq(9, 8, 7, 3, 3, 1)) // descending
    assert(rev.drop(6).forall(_.isEmpty)) // NAs last under desc
    // ds == ds2: order(col, rev) spec equals rev tuple spec — both are
    // Ordering(desc=...) here, structurally identical by construction
    val ds = sortDf.sortBy(Ordering("dv1", desc = true), Ordering("dv3"))
    val ds2 = sortDf.orderBy(F.col("dv1").desc_nulls_last, F.col("dv3").asc)
    assert(ds.collect().toSeq == ds2.collect().toSeq)
  }

  test("duplicates.jl: duplicated mask and drop_duplicates") {
    // df = [1,2,3,3,4]; duplicated == [F,F,F,T,F] (test/duplicates.jl:6-9)
    val df = Seq((1, 1), (2, 2), (3, 3), (3, 4), (4, 5)).toDF("a", "rid")
    val marked = graft.dedup.Dedup.exactDups(df, "a", "rid")
    val mask = marked.orderBy("rid").collect().map(_.getAs[Boolean]("is_dup"))
    assert(mask.toSeq == Seq(false, false, false, true, false))
    val dropped = df.dedupFirst(Seq("a"), "rid")
      .select("a").orderBy("a").collect().map(_.getInt(0))
    assert(dropped.toSeq == Seq(1, 2, 3, 4))
  }

  test("operators.jl: NA propagates through arithmetic and comparison") {
    // @assert isna(f(df, NA)) for arithmetic; isna(NA .== df)
    // (test/operators.jl:118-126, 204-205)
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val nullLit = F.lit(null).cast("double")
    val r = df.select(
      (F.col("v") + nullLit).as("add"),
      (F.col("v") * nullLit).as("mul"),
      (F.col("v") === nullLit).as("eq"),
      (F.col("v") > nullLit).as("gt")).collect()
    r.foreach { row => (0 until 4).foreach(i => assert(row.isNullAt(i))) }
    // NA ^ 2.0 is NA (test/operators.jl:193)
    assert(df.select(F.pow(F.col("v"), 2.0)).collect()(1).isNullAt(0))
  }

  test("data.jl: hcat name collision gets _1 suffix (make_unique)") {
    // dfc = hcat(df3, df4); colnames == ["x1","x1_1","x2"]
    // (test/data.jl:46-49)
    val df3 = Seq(1, 2, 3, 4).toDF("x1")
    val df4 = Seq((5, 5), (6, 6), (7, 7), (8, 8)).toDF("x1", "x2")
    val dfc = df3.hcat(df4, Seq("x1"), Seq("x1", "x2"))
    assert(dfc.columns.toSeq == Seq("x1", "x1_1", "x2"))
    assert(dfc.count() == 4)
  }

  test("salted aggregation equals direct aggregation") {
    val o = T.load(spark, sf, "orders")
    val direct = o.groupBy("o_orderstatus").agg(
      F.sum("o_totalprice").as("s"), F.count(F.lit(1)).as("n"),
      F.min("o_totalprice").as("mn"), F.avg("o_totalprice").as("a"))
    val salted = Skew.saltedBy(o, Seq("o_orderstatus"), 8,
      "s" -> "sum(o_totalprice)", "n" -> "count(*)",
      "mn" -> "min(o_totalprice)", "a" -> "avg(o_totalprice)")
    assert(salted.columns.toSeq ==
      Seq("o_orderstatus", "s", "n", "mn", "a"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getDouble(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))
      }.toMap
    val d = toMap(direct)
    val sl = toMap(salted)
    assert(d.keySet == sl.keySet)
    d.foreach { case (k, (s1, n1, mn1, a1)) =>
      val (s2, n2, mn2, a2) = sl(k)
      assert(math.abs(s1 - s2) < 1e-6 && n1 == n2 &&
        mn1 == mn2 && math.abs(a1 - a2) < 1e-9)
    }
  }
}
