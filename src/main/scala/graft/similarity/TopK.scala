package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k.
  *
  * The window formulation (`row_number over partitionBy(group)`)
  * shuffles EVERY candidate row to the group's reducer and sorts them;
  * this typed Aggregator keeps only k entries per group per map task,
  * so the shuffle carries O(groups × k) instead of O(candidates) — the
  * difference between feasible and not at 100 TB fan-outs. Exact: same
  * (score desc, id asc) order as the window path (equality-tested).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

  // order: score desc, id asc
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(lt).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && !lt(a, b.last)) b else trim(b :+ a)
  override def merge(b1: Seq[(Double, Long)],
                     b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] =
    r.sortWith(lt)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {

  /** Per-group top-k of (scoreCol, idCol) pairs → exploded rows
    * (group..., id, score, rank). */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
               idCol: String, k: Int): DataFrame = {
    val udaf = F.udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    val agged = df.groupBy(groupCols.map(F.col): _*)
      .agg(udaf(F.col(scoreCol), F.col(idCol)).as("topk"))
    agged
      .select(groupCols.map(F.col) :+
        F.posexplode(F.col("topk")).as(Seq("pos", "entry")): _*)
      .select(groupCols.map(F.col) ++ Seq(
        F.col("entry._2").as(idCol),
        F.col("entry._1").as(scoreCol),
        (F.col("pos") + 1).as("rank")): _*)
  }
}
