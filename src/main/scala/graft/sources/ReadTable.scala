package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV/TSV/WSV reader facade — reference `readtable`
  * (src/io.jl:596-655) with its `ParseOptions` surface
  * (src/io.jl:11-31) mapped onto Spark's (Univocity-based) CSV source.
  *
  * The reference's byte-scanner + Int→Float64→Bool→String inference
  * cascade (src/io.jl:135-263, 427-474) is subsumed by Spark's
  * partition-parallel reader with `inferSchema` — the scan splits across
  * the cluster, which is the distributed `dreadtable`
  * (src/dataframe_blocks.jl:126-152) for free. `.gz` decompresses
  * transparently on both systems (src/io.jl:623-625).
  */
final case class ReadOptions(
    header: Boolean = true,                 // src/io.jl:617 allowcomments etc.
    separator: Option[Char] = None,         // default: from extension
    quotemark: Char = '"',
    naStrings: Seq[String] = Seq("NA", ""), // src/io.jl:20 nastrings
                                            // (first non-empty is the
                                            // CSV nullValue; empties are
                                            // null by default)
    multiline: Boolean = false,             // quoted embedded newlines;
                                            // forces single-task file
                                            // reads — off by default
    trueStrings: Seq[String] = Seq("T", "t", "TRUE", "true"), // src/io.jl:602
    falseStrings: Seq[String] = Seq("F", "f", "FALSE", "false"),
    commentMark: Option[Char] = None,       // src/io.jl:24 commentmark
    skipStart: Int = 0,                     // src/io.jl:26 skipstart
    nrows: Option[Int] = None,              // src/io.jl:18 nrows limit
    ignorePadding: Boolean = true,          // src/io.jl:23
    inferSchema: Boolean = true,
    colNames: Seq[String] = Nil)            // src/io.jl:25 names override

object ReadTable {

  /** Separator from extension: .csv→',' .tsv→'\t' .wsv→' '
    * (reference getseparator, src/io.jl:121-131). */
  def separatorFor(path: String): Char = {
    val base = path.stripSuffix(".gz").stripSuffix(".bz2")
    base.split('.').lastOption.map(_.toLowerCase) match {
      case Some("csv") => ','
      case Some("tsv") => '\t'
      case Some("wsv") => ' '
      case _ => ','
    }
  }

  def readtable(spark: SparkSession, path: String,
                opts: ReadOptions = ReadOptions()): DataFrame = {
    val sep = opts.separator.getOrElse(separatorFor(path))
    var r = spark.read
      .option("header", opts.header.toString)
      .option("sep", sep.toString)
      .option("quote", opts.quotemark.toString)
      .option("escape", opts.quotemark.toString) // CSV doubled-quote style
      .option("nullValue", opts.naStrings.find(_.nonEmpty).getOrElse(""))
      .option("multiLine", opts.multiline.toString)
      .option("inferSchema", opts.inferSchema.toString)
      .option("ignoreLeadingWhiteSpace", opts.ignorePadding.toString)
      .option("ignoreTrailingWhiteSpace", opts.ignorePadding.toString)
      .option("mode", "PERMISSIVE")
    opts.commentMark.foreach(c => r = r.option("comment", c.toString))
    // skipstart (src/io.jl:26): Spark CSV has no skip-N-lines option;
    // route through the text source with a line index. Only the head of
    // the file is affected, so the shuffle-free path stays for the
    // common case.
    var df =
      if (opts.skipStart > 0) {
        import spark.implicits._
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= opts.skipStart).map(_._1)
        r.csv(spark.createDataset(lines))
      } else r.csv(path)
    // Reference true/false string sets are wider than Spark's CSV
    // booleans (src/io.jl:356-368, 602-603: T/t/F/f parse as Bool), and
    // nastrings is a SET while Spark's nullValue is one string. Finish
    // both post-parse: null out extra naStrings, then cast string
    // columns whose non-null values all fall in trueStrings ∪
    // falseStrings. One aggregate pass decides every candidate column
    // together (the reference pays the same inference scan in-parse).
    if (opts.inferSchema) df = boolishPostCast(df, opts)
    if (opts.colNames.nonEmpty) {
      require(opts.colNames.size == df.columns.length,
        s"colNames size ${opts.colNames.size} != ${df.columns.length}")
      df = df.toDF(opts.colNames: _*)
    }
    opts.nrows.map(df.limit).getOrElse(df)
  }

  /** Post-parse finish of the reference's inference cascade for the
    * pieces Spark's CSV options can't express: extra `naStrings`
    * entries → null, and all-boolean-ish string columns → boolean
    * (reference src/io.jl:356-368, 602-603). Costs one aggregate scan
    * over the string columns, same order as the inference scan itself.
    */
  private def boolishPostCast(df0: DataFrame,
                              opts: ReadOptions): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.types.StringType
    val strCols = df0.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq
    if (strCols.isEmpty) return df0
    val primaryNa = opts.naStrings.find(_.nonEmpty).getOrElse("")
    val extraNa = opts.naStrings.filter(s => s.nonEmpty && s != primaryNa)
    val df =
      if (extraNa.isEmpty) df0
      else strCols.foldLeft(df0) { (d, c) =>
        d.withColumn(c,
          F.when(F.col(c).isin(extraNa: _*), F.lit(null))
            .otherwise(F.col(c)))
      }
    val tf = opts.trueStrings ++ opts.falseStrings
    if (tf.isEmpty) return df
    val aggs = strCols.flatMap { c =>
      Seq(
        F.bool_and(F.col(c).isNull || F.col(c).isin(tf: _*))
          .as(s"${c}__all"),
        F.bool_or(F.col(c).isNotNull).as(s"${c}__any"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    def flag(name: String): Boolean = {
      val i = row.fieldIndex(name)
      !row.isNullAt(i) && row.getBoolean(i)
    }
    val boolish =
      strCols.filter(c => flag(s"${c}__all") && flag(s"${c}__any"))
    boolish.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        F.when(F.col(c).isin(opts.trueStrings: _*), true)
          .when(F.col(c).isin(opts.falseStrings: _*), false))
    }
  }

  /** reference writetable (src/io.jl:726-791): header + separator +
    * quoting; `coalesce(1)` mimics the single-file output, omit it for
    * the distributed part-file layout (dwritetable,
    * src/dataframe_blocks.jl:590-625). */
  def writetable(df: DataFrame, path: String, separator: Char = ',',
                 header: Boolean = true, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", header.toString)
      .option("sep", separator.toString)
      .csv(path)
  }

  /** HTML table writer — reference MIME"text/html" show
    * (src/io.jl:805-827): header row + up to `n` body rows, values
    * escaped, nulls as the reference's `NA`. Presentation-layer by
    * nature: collects only the `limit(n)` head (bounded driver data),
    * exactly like the reference's truncated notebook display. */
  def toHtml(df: DataFrame, n: Int = 30): String = {
    val cols = df.columns
    val esc = (s: String) => s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = df.limit(n).collect().map { r =>
      cols.indices.map { i =>
        val cell = if (r.isNullAt(i)) "NA" else esc(String.valueOf(r.get(i)))
        s"<td>$cell</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString
    s"<table><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }
}
