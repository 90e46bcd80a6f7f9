package graft

import org.apache.spark.sql.SparkSession

/** Streaming slice of the partition-invariance gate (r14 verdict
  * task 5). InvarianceSpec deliberately excludes stateful queries —
  * each pays checkpoint-dir + micro-batch plumbing, so running all
  * ~30 twice would blow the test wall — leaving their invariance
  * evidence as the round-13 manual campaign. This suite promotes the
  * three cheapest stateful shapes into every `sbt test` run:
  * complete-mode keyed aggregation (q60), streaming dedup at the door
  * (q96 — arrival-order sensitive BY construction, so the shape most
  * likely to break), and the CountMin heavy-hitter path (q314 —
  * merge-order across state partitions must not leak into counters).
  *
  * The state-store partition count is fixed at a streaming query's
  * first batch from the session's shuffle partitions (runStateful
  * clamps to min(8, session)), so 8-vs-3 here exercises REAL
  * different state-store layouts, not just exchange partitioning.
  * sf0.001 + three queries keeps the whole suite well inside the
  * 90 s budget (measured ~25 s on the shared test session).
  */
class StreamInvarianceSpec extends SparkSpec {

  private val targets =
    Seq("q60_stream_agg", "q96_stream_dedup", "q314_stream_heavy_hitters")

  /** Same canonical form as InvarianceSpec: bit-faithful cells,
    * explicit separator, rows sorted. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .toSeq.sorted

  private def sessionWith(shufflePartitions: Int): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
    s
  }

  test("streaming state-store results are partition-count invariant " +
      "(8 vs 3 state partitions)") {
    val s8 = sessionWith(8)
    val s3 = sessionWith(3)
    val broken = targets.flatMap { name =>
      val q = SparkEntry.queries(name)
      val a = canon(q(s8, sf))
      val b = canon(q(s3, sf))
      if (a == b) None
      else Some(s"$name: ${a.size} vs ${b.size} rows, first diff " +
        a.zip(b).collectFirst { case (x, y) if x != y => s"$x != $y" }
          .getOrElse("row-count"))
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }
}
