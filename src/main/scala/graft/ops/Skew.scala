package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Skew mitigation — explicit salting for hot keys (SCALE.md; AQE's
  * skew handling covers joins, but a pathologically hot GROUP BY key
  * still funnels one reducer; salting splits it).
  */
object Skew {

  /** Salted two-stage aggregation for algebraic aggregates.
    *
    * Stage 1 groups by (keys, salt) — the hot key's rows spread over
    * `salts` reducers; stage 2 merges partials by key. Supported specs:
    * out -> "sum(col)" | "count(*)" | "min(col)" | "max(col)" |
    * "avg(col)" (avg decomposes into sum+count and recombines — the
    * classic algebraic-aggregate split).
    */
  def saltedBy(df: DataFrame, keys: Seq[String], salts: Int,
               aggs: (String, String)*): DataFrame = {
    val AggRe = "(sum|count|min|max|avg)\\((.+)\\)".r
    val salted = df.withColumn("__salt",
      F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
        F.lit(salts)))
    val stage1 = aggs.flatMap { case (out, spec) =>
      spec.trim match {
        case AggRe("sum", c) => Seq(F.expr(s"sum($c)").as(s"__s_$out"))
        case AggRe("count", _) => Seq(F.expr("count(*)").as(s"__c_$out"))
        case AggRe("min", c) => Seq(F.expr(s"min($c)").as(s"__mn_$out"))
        case AggRe("max", c) => Seq(F.expr(s"max($c)").as(s"__mx_$out"))
        case AggRe("avg", c) =>
          Seq(F.expr(s"sum($c)").as(s"__as_$out"),
            F.expr(s"count($c)").as(s"__ac_$out"))
        case other => throw new IllegalArgumentException(
          s"unsupported salted agg: $other")
      }
    }
    val partial = salted.groupBy((keys :+ "__salt").map(F.col): _*)
      .agg(stage1.head, stage1.tail: _*)
    val stage2 = aggs.map { case (out, spec) =>
      spec.trim match {
        case AggRe("sum", _) => F.expr(s"sum(__s_$out)").as(out)
        case AggRe("count", _) => F.expr(s"sum(__c_$out)").as(out)
        case AggRe("min", _) => F.expr(s"min(__mn_$out)").as(out)
        case AggRe("max", _) => F.expr(s"max(__mx_$out)").as(out)
        case AggRe("avg", _) =>
          F.expr(s"sum(__as_$out) / sum(__ac_$out)").as(out)
      }
    }
    partial.groupBy(keys.map(F.col): _*).agg(stage2.head, stage2.tail: _*)
  }
}
