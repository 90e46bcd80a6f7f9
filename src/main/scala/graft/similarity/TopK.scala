package graft.similarity

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{DataFrame, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k.
  *
  * The window formulation (`row_number over partitionBy(group)`)
  * shuffles EVERY candidate row to the group's reducer and sorts them;
  * this typed Aggregator keeps only k entries per group per map task,
  * so the shuffle carries O(groups × k) instead of O(candidates) — the
  * difference between feasible and not at 100 TB fan-outs. Exact: same
  * (score desc, id asc) order as the window path (equality-tested in
  * PipelineSpec, and q80/q87 run on this path against their oracles).
  */
class TopKAgg[I: Ordering](k: Int)(
    implicit bufEnc: Encoder[Seq[(Double, I)]])
    extends Aggregator[(Double, I), Seq[(Double, I)], Seq[(Double, I)]] {

  private val ord = implicitly[Ordering[I]]

  // order: score desc, id asc
  private def lt(a: (Double, I), b: (Double, I)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && ord.lt(a._2, b._2))

  private def trim(s: Seq[(Double, I)]): Seq[(Double, I)] =
    s.sortWith(lt).take(k)

  override def zero: Seq[(Double, I)] = Seq.empty
  override def reduce(b: Seq[(Double, I)],
                      a: (Double, I)): Seq[(Double, I)] =
    if (b.size >= k && !lt(a, b.last)) b else trim(b :+ a)
  override def merge(b1: Seq[(Double, I)],
                     b2: Seq[(Double, I)]): Seq[(Double, I)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Double, I)]): Seq[(Double, I)] =
    r.sortWith(lt)
  override def bufferEncoder: Encoder[Seq[(Double, I)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Double, I)]] = bufEnc
}

object TopK {

  /** Per-group top-k of (scoreCol, idCol) pairs → exploded rows
    * (group..., id, score, rank). `rankName` names the rank column
    * (queries differ: "rank" vs "rn"). */
  def perGroup[I: Ordering: TypeTag](
      df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int, rankName: String = "rank"): DataFrame = {
    implicit val bufEnc: Encoder[Seq[(Double, I)]] =
      ExpressionEncoder[Seq[(Double, I)]]()
    val udaf =
      F.udaf(new TopKAgg[I](k), ExpressionEncoder[(Double, I)]())
    val agged = df.groupBy(groupCols.map(F.col): _*)
      .agg(udaf(F.col(scoreCol), F.col(idCol)).as("topk"))
    agged
      .select(groupCols.map(F.col) :+
        F.posexplode(F.col("topk")).as(Seq("pos", "entry")): _*)
      .select(groupCols.map(F.col) ++ Seq(
        F.col("entry._2").as(idCol),
        F.col("entry._1").as(scoreCol),
        (F.col("pos") + 1).as(rankName)): _*)
  }
}
