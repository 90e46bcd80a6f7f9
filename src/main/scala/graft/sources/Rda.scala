package graft.sources

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `read_rda`: R workspace files (.rda / .RData, format version 2) →
  * DataFrames — reference read_rda (src/RDA.jl:257-309; format is the
  * public R serialization described in the R Internals manual §1.8).
  *
  * Scope mirrors the reference: XDR (big-endian) RDX2 payloads,
  * optionally gzip-wrapped, carrying data.frames of numeric / integer /
  * logical / character / factor columns (factors decoded to their
  * string levels; R NA encodings → null).
  *
  * A .rda is a single sequential binary blob — inherently a
  * driver-side parse, exactly like the reference's file read. The
  * 100 TB posture is: this is an INGEST format; convert once to
  * parquet (`writetable`/parquet) and never re-parse. The resulting
  * DataFrame is created with a local-relation plan, so everything
  * downstream is ordinary distributed Spark.
  */
object Rda {

  // SEXPTYPE codes (R Internals §1.8)
  private val SYM = 1; private val PAIRLIST = 2; private val CHAR = 9
  private val LGL = 10; private val INT = 13; private val REAL = 14
  private val CPLX = 15; private val STR = 16; private val VEC = 19
  private val NILVALUE = 254; private val REF = 255

  private val NaInt = Int.MinValue
  // R's NA_real_ is a specific quiet-NaN payload (bit pattern
  // 0x7FF00000000007A2); any other NaN stays NaN.
  private val NaRealBits = 0x7FF00000000007A2L

  private sealed trait RObj
  private case object RNull extends RObj
  private final case class RSym(name: String) extends RObj
  private final case class RChar(s: String) extends RObj // null s = NA
  private final case class RVector(
      tpe: Int, values: IndexedSeq[Any],
      attrs: Map[String, RObj]) extends RObj
  private final case class RPairs(items: List[(String, RObj)]) extends RObj

  private final class Parser(in: DataInputStream) {
    private val refs = scala.collection.mutable.ArrayBuffer.empty[RObj]

    private def readLengthPrefixed(): Int = in.readInt()

    def readItem(): RObj = {
      val flags = in.readInt()
      val tpe = flags & 0xff
      val hasAttr = (flags & 0x200) != 0
      val hasTag = (flags & 0x400) != 0
      tpe match {
        case NILVALUE => RNull
        case REF =>
          // packed ref index; 0 means the index follows as its own int
          val packed = flags >> 8
          val idx = (if (packed == 0) in.readInt() else packed) - 1
          refs(idx)
        case SYM =>
          val name = readItem() match {
            case RChar(s) => s
            case other => sys.error(s"symbol name not CHARSXP: $other")
          }
          val sym = RSym(name)
          refs += sym
          sym
        case CHAR =>
          val n = readLengthPrefixed()
          if (n == -1) RChar(null)
          else {
            val bytes = new Array[Byte](n)
            in.readFully(bytes)
            // levels bits carry the encoding; LATIN1 = 0x04 << 12
            val latin1 = (flags & (0x04 << 12)) != 0
            RChar(new String(bytes,
              if (latin1) "ISO-8859-1" else "UTF-8"))
          }
        case PAIRLIST =>
          // (attr?) tag? car, then cdr continues the list
          val items = List.newBuilder[(String, RObj)]
          var f = flags
          var continue = true
          while (continue) {
            if ((f & 0x200) != 0) readItem() // pairlist attrs: skip
            val tag = if ((f & 0x400) != 0) readItem() else RNull
            val car = readItem()
            items += ((tag match {
              case RSym(n) => n
              case _ => ""
            }) -> car)
            val nxt = in.readInt()
            if ((nxt & 0xff) == PAIRLIST) f = nxt
            else if ((nxt & 0xff) == NILVALUE) continue = false
            else sys.error(f"unexpected pairlist cdr type ${nxt & 0xff}%d")
          }
          RPairs(items.result())
        case LGL | INT =>
          val n = readLengthPrefixed()
          val vals = IndexedSeq.tabulate[Any](n)(_ => in.readInt())
          RVector(tpe, vals, if (hasAttr) readAttrs() else Map.empty)
        case REAL =>
          val n = readLengthPrefixed()
          val vals = IndexedSeq.tabulate[Any](n)(_ => in.readLong())
          RVector(tpe, vals, if (hasAttr) readAttrs() else Map.empty)
        case CPLX =>
          // CPLXSXP: n (re, im) double pairs — reference RComplex
          // (src/RDA.jl:209-213); kept as raw bit pairs so the NA
          // pattern survives until column decoding.
          val n = readLengthPrefixed()
          val vals = IndexedSeq.tabulate[Any](n)(_ =>
            (in.readLong(), in.readLong()))
          RVector(tpe, vals, if (hasAttr) readAttrs() else Map.empty)
        case STR =>
          val n = readLengthPrefixed()
          val vals = IndexedSeq.tabulate[Any](n)(_ => readItem())
          RVector(tpe, vals, if (hasAttr) readAttrs() else Map.empty)
        case VEC =>
          val n = readLengthPrefixed()
          val vals = IndexedSeq.tabulate[Any](n)(_ => readItem())
          RVector(tpe, vals, if (hasAttr) readAttrs() else Map.empty)
        case other =>
          sys.error(s"read_rda: unsupported SEXPTYPE $other " +
            "(scope: data.frame column types, like the reference)")
      }
    }

    private def readAttrs(): Map[String, RObj] = readItem() match {
      case RPairs(items) => items.toMap
      case RNull => Map.empty
      case other => sys.error(s"unexpected attributes object: $other")
    }
  }

  /** Parse every data.frame saved in the .rda into a DataFrame, keyed
    * by its saved symbol name. */
  def readRda(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val fileIn = new BufferedInputStream(new FileInputStream(path))
    fileIn.mark(2)
    val m1 = fileIn.read(); val m2 = fileIn.read()
    fileIn.reset()
    val raw = if (m1 == 0x1f && m2 == 0x8b) new GZIPInputStream(fileIn)
              else fileIn
    val in = new DataInputStream(new BufferedInputStream(raw))
    try {
      val magic = new Array[Byte](5)
      in.readFully(magic)
      require(new String(magic, "US-ASCII") == "RDX2\n",
        s"not an RDA version-2 file: $path")
      val fmt = new Array[Byte](2)
      in.readFully(fmt)
      require(new String(fmt, "US-ASCII") == "X\n",
        "only XDR (binary) RDA payloads are supported")
      in.readInt() // serialization version
      in.readInt() // writer R version
      in.readInt() // minimal reader R version
      val parser = new Parser(in)
      parser.readItem() match {
        case RPairs(items) =>
          items.collect {
            case (name, v: RVector) if isDataFrame(v) =>
              name -> toDataFrame(spark, v)
          }.toMap
        case RNull => Map.empty
        case other => sys.error(s"unexpected top-level object: $other")
      }
    } finally in.close()
  }

  private def isDataFrame(v: RVector): Boolean =
    v.tpe == VEC && (v.attrs.get("class") match {
      case Some(RVector(STR, cls, _)) =>
        cls.exists { case RChar("data.frame") => true; case _ => false }
      case _ => false
    })

  private def strings(o: RObj): IndexedSeq[String] = o match {
    case RVector(STR, vals, _) =>
      vals.map { case RChar(s) => s; case x => sys.error(s"not char: $x") }
    case _ => sys.error(s"expected character vector, got $o")
  }

  /** One column → (Spark type, decoded cell values). */
  private def column(o: RObj): (DataType, IndexedSeq[Any]) = o match {
    case v @ RVector(INT, vals, attrs) if attrs.contains("levels") =>
      // factor: 1-based level codes → level strings
      val levels = strings(attrs("levels"))
      (StringType, vals.map { x =>
        val i = x.asInstanceOf[Int]
        if (i == NaInt) null else levels(i - 1)
      })
    case RVector(INT, vals, _) =>
      (IntegerType, vals.map { x =>
        val i = x.asInstanceOf[Int]
        if (i == NaInt) null else i
      })
    case RVector(LGL, vals, _) =>
      (BooleanType, vals.map { x =>
        val i = x.asInstanceOf[Int]
        if (i == NaInt) null else i != 0
      })
    case RVector(REAL, vals, _) =>
      (DoubleType, vals.map { x =>
        val bits = x.asInstanceOf[Long]
        if (bits == NaRealBits) null
        else java.lang.Double.longBitsToDouble(bits)
      })
    case RVector(STR, vals, _) =>
      (StringType, vals.map { case RChar(s) => s; case _ => null })
    case RVector(CPLX, vals, _) =>
      // Complex128 → struct<re double, im double> (Spark has no complex
      // type). The whole cell is NA when either part carries the NA
      // bit pattern — reference data(rc::RComplex) (src/RDA.jl:304).
      (StructType(Seq(StructField("re", DoubleType, nullable = false),
        StructField("im", DoubleType, nullable = false))),
        vals.map { x =>
          val (re, im) = x.asInstanceOf[(Long, Long)]
          if (re == NaRealBits || im == NaRealBits) null
          else Row(java.lang.Double.longBitsToDouble(re),
            java.lang.Double.longBitsToDouble(im))
        })
    case other => sys.error(s"read_rda: unsupported column object $other")
  }

  private def toDataFrame(spark: SparkSession, v: RVector): DataFrame = {
    val names = strings(v.attrs.getOrElse("names",
      sys.error("data.frame without names attribute")))
    val cols = v.values.map(o => column(o.asInstanceOf[RObj]))
    val schema = StructType(names.zip(cols).map { case (n, (t, _)) =>
      StructField(n, t, nullable = true)
    })
    val nrows = cols.headOption.map(_._2.length).getOrElse(0)
    val rows = (0 until nrows).map(r =>
      Row.fromSeq(cols.map(_._2(r))))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }
}
