package graft

import org.apache.spark.sql.{functions => F}

/** Edge-case tests for the wave-6 mining/outlier/linkage operators —
  * closed-form hand checks: BFS hop minimality on a path graph, LOF of
  * a planted outlier, sweep-line concurrency on overlapping intervals,
  * exact-Shapley efficiency (credits sum to v(N) − v(∅)), and midpoint
  * linear interpolation.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: min hop on a path graph, bound respected") {
    // path 1-2-3-4-5-6, seed {1}, maxHops 3 → 4 reachable at hop 3,
    // 5 and 6 beyond the bound
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("node")
    val got = graft.ops.Graph.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: first discovery wins over a longer alternative path") {
    // triangle 1-2, 2-3, 1-3 plus tail 3-4: node 3 is at hop 1 (direct)
    // even though a 2-hop path via 2 also exists
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    val got = graft.ops.Graph.bfsHops(edges, Seq(1L).toDF("node"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("sweep-line concurrency: overlap counts, adjacency does not") {
    // sessions [0,10], [5,15] overlap → peak 2; [16,20] starts after
    // [5,15] ends (end+1 = 16) → the -1 lands exactly on its +1 sec,
    // so the level never reads 2 there
    val sessions = Seq((0L, 10L), (5L, 15L), (16L, 20L))
    val deltas = sessions.toDF("st", "en")
      .select(F.col("st").as("sec"), F.lit(1L).as("d"))
      .unionAll(sessions.toDF("st", "en")
        .select((F.col("en") + 1).as("sec"), F.lit(-1L).as("d")))
      .groupBy("sec").agg(F.sum("d").as("net"))
    val pre = graft.ops.RelOps.globalPrefixSum(deltas, "net", "cum",
      Seq(graft.ops.RelOps.Ordering("sec")))
    val lvl = pre.select(F.col("sec"),
      (F.col("cum") + F.col("net")).as("conc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lvl(5L) === 2L)   // both open
    assert(lvl(16L) === 1L)  // close of [5,15] fused with open of [16,20]
    assert(lvl.values.max === 2L)
  }

  test("LOF: a planted far-off point scores highest") {
    val emb = (0 until 10).map(i =>
      (i.toLong, Array(math.cos(i * 0.01).toFloat,
        math.sin(i * 0.01).toFloat))) :+
      (99L, Array(-1f, -1f)) // opposite quadrant → cosine outlier
    val df = emb.toDF("vec_id", "embedding")
    val knn = graft.similarity.Knn
      .bruteForceKnn(df, df, "vec_id", "embedding", 3)
      .withColumn("di",
        F.round((F.lit(1.0) - F.col("sim")) * 1e6).cast("long"))
    val kd = knn.groupBy("query_id").agg(F.max("di").as("kdist"))
    val reach = knn
      .join(kd.withColumnRenamed("query_id", "neighbor_id"),
        "neighbor_id")
      .select(F.col("query_id").as("a"), F.col("neighbor_id").as("b"),
        F.greatest(F.col("kdist"), F.col("di")).as("rd"))
    val sums = reach.groupBy("a")
      .agg(F.greatest(F.sum("rd"), F.lit(1L)).as("S"))
    val lof = reach.join(sums.toDF("a", "Sa"), "a")
      .join(sums.toDF("b", "Sb"), "b")
      .groupBy("a")
      .agg((F.max(F.col("Sa")).cast("double") / 3.0
        * F.sum(F.lit(1.0) / F.col("Sb"))).as("lof"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lof(99L) === lof.values.max)
    assert(lof(99L) > 2.0) // far off the tight cluster
  }

  test("Shapley efficiency: credits sum to v(N) - v(empty)") {
    val dir = "/root/testdata/sf0.001"
    val res = graft.queries.MiningQueries
      .queries("q216_shapley")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = res.values.sum
    // v(N) = all converted users; v(∅) = converted users with no prior
    // channel events — recompute both directly
    val ev = T.load(spark, dir, "events")
    val fp = ev.filter(F.col("event_type") === "purchase")
      .groupBy("user_id").agg(F.min("ts").as("pts"))
    val vn = fp.count()
    val withCh = ev.join(fp, "user_id")
      .filter(F.col("ts") < F.col("pts") &&
        F.col("event_type") =!= "purchase")
      .select("user_id").distinct().count()
    val vEmpty = vn - withCh
    assert(math.abs(total - (vn - vEmpty).toDouble) < 1e-6,
      s"sum=$total vN=$vn vEmpty=$vEmpty")
  }

  test("linear interpolation hits the midpoint exactly") {
    // two anchors (sec 0 → 1.00, sec 7200 → 3.00); grid hits 0, 3600,
    // 7200 → 1.0, 2.0, 3.0
    val df = Seq((1L, 1L, 0L, 100L), (1L, 2L, 7200L, 300L))
      .toDF("user_id", "event_id", "sec", "vc")
    val anchors = df.select(F.col("user_id"), F.col("sec"),
      F.col("sec").as("at"), F.col("vc"), F.lit(0).as("g"))
    val grid = Seq((1L, 0L), (1L, 3600L), (1L, 7200L))
      .toDF("user_id", "sec")
      .select(F.col("user_id"), F.col("sec"),
        F.lit(null).cast("long").as("at"),
        F.lit(null).cast("long").as("vc"), F.lit(1).as("g"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(F.col("sec"), F.col("g"))
    val wPrev = ord.rowsBetween(Long.MinValue, 0)
    val wNext = ord.rowsBetween(0, Long.MaxValue)
    val got = anchors.unionAll(grid)
      .withColumn("t0", F.last("at", ignoreNulls = true).over(wPrev))
      .withColumn("v0", F.last("vc", ignoreNulls = true).over(wPrev))
      .withColumn("t1", F.first("at", ignoreNulls = true).over(wNext))
      .withColumn("v1", F.first("vc", ignoreNulls = true).over(wNext))
      .filter(F.col("g") === 1 && F.col("t0").isNotNull)
      .select(F.col("sec"),
        F.when(F.col("t1").isNull, F.round(F.col("v0") / 100.0, 6))
          .otherwise(F.round(
            (F.col("v0") * (F.col("t1") - F.col("t0"))
              + (F.col("v1") - F.col("v0")) * (F.col("sec") - F.col("t0")))
              .cast("double")
              / ((F.col("t1") - F.col("t0")) * 100).cast("double"), 6))
          .as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 1.0, 3600L -> 2.0, 7200L -> 3.0))
  }
}
