package graft

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import graft.sources.Rda

/** read_rda: a clean-room XDR RDA writer builds a fixture in-test (the
  * format is the public R Internals §1.8 serialization), and the
  * reference repo's own R-generated .rda files (test/data/RDA dir) pin
  * behavior parity — same expected frames as the reference's RDA tests.
  */
class RdaSpec extends SparkSpec {

  // ---- minimal XDR RDA writer (test fixture generator) ----------------

  private def buildRda(gzip: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def str(flags: Int, s: String): Unit = {
      o.writeInt(flags); o.writeInt(s.length)
      o.write(s.getBytes("UTF-8"))
    }
    o.write("RDX2\nX\n".getBytes("US-ASCII"))
    o.writeInt(2); o.writeInt(0x030001); o.writeInt(0x020300)
    o.writeInt(0x402)           // pairlist w/ tag
    o.writeInt(1); str(0x40009, "df") // SYMSXP "df" (ref 1)
    o.writeInt(0x313)           // VECSXP | object | attrs
    o.writeInt(3)               // 3 columns
    o.writeInt(14); o.writeInt(2) // REALSXP: 1.5, NA
    o.writeLong(java.lang.Double.doubleToLongBits(1.5))
    o.writeLong(0x7FF00000000007A2L) // R NA_real_
    o.writeInt(13); o.writeInt(2) // INTSXP: 7, NA
    o.writeInt(7); o.writeInt(Int.MinValue)
    o.writeInt(16); o.writeInt(2) // STRSXP: "ok", NA
    str(0x40009, "ok"); o.writeInt(9); o.writeInt(-1)
    // attributes: names, class
    o.writeInt(0x402); o.writeInt(1); str(0x40009, "names")
    o.writeInt(16); o.writeInt(3)
    str(0x40009, "d"); str(0x40009, "i"); str(0x40009, "s")
    o.writeInt(0x402); o.writeInt(1); str(0x40009, "class")
    o.writeInt(16); o.writeInt(1); str(0x40009, "data.frame")
    o.writeInt(0xfe)            // end attrs
    o.writeInt(0xfe)            // end top pairlist
    o.flush()
    if (!gzip) bos.toByteArray
    else {
      val gz = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(gz)
      g.write(bos.toByteArray); g.close()
      gz.toByteArray
    }
  }

  private def writeTmp(bytes: Array[Byte]): String = {
    val f = java.io.File.createTempFile("graft", ".rda")
    f.deleteOnExit()
    val out = new FileOutputStream(f)
    out.write(bytes); out.close()
    f.getPath
  }

  test("parses a hand-built XDR data.frame, plain and gzip, NAs as null") {
    for (gz <- Seq(false, true)) {
      val dfs = Rda.readRda(spark, writeTmp(buildRda(gz)))
      assert(dfs.keySet == Set("df"))
      val rows = dfs("df").orderBy("i").collect()
      assert(dfs("df").columns.toSeq == Seq("d", "i", "s"))
      assert(rows.length == 2)
      val full = rows.find(!_.isNullAt(1)).get
      assert(full.getDouble(0) == 1.5 && full.getInt(1) == 7 &&
        full.getString(2) == "ok")
      val nas = rows.find(_.isNullAt(1)).get
      assert(nas.isNullAt(0) && nas.isNullAt(2))
    }
  }

  // CPLXSXP fixture: a data.frame with one complex column (re+im
  // pairs, one cell NA via the NA bit pattern in the real part) —
  // reference RComplex reader parity (src/RDA.jl:209-213,304).
  private def buildComplexRda(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def str(flags: Int, s: String): Unit = {
      o.writeInt(flags); o.writeInt(s.length)
      o.write(s.getBytes("UTF-8"))
    }
    o.write("RDX2\nX\n".getBytes("US-ASCII"))
    o.writeInt(2); o.writeInt(0x030001); o.writeInt(0x020300)
    o.writeInt(0x402)
    o.writeInt(1); str(0x40009, "df")
    o.writeInt(0x313)           // VECSXP | object | attrs
    o.writeInt(2)               // 2 columns
    o.writeInt(15); o.writeInt(3) // CPLXSXP: 1.5+2.5i, NA, -3+0i
    o.writeLong(java.lang.Double.doubleToLongBits(1.5))
    o.writeLong(java.lang.Double.doubleToLongBits(2.5))
    o.writeLong(0x7FF00000000007A2L) // NA_real_ in the real part
    o.writeLong(java.lang.Double.doubleToLongBits(0.0))
    o.writeLong(java.lang.Double.doubleToLongBits(-3.0))
    o.writeLong(java.lang.Double.doubleToLongBits(0.0))
    o.writeInt(13); o.writeInt(3) // INTSXP key: 1, 2, 3
    o.writeInt(1); o.writeInt(2); o.writeInt(3)
    o.writeInt(0x402); o.writeInt(1); str(0x40009, "names")
    o.writeInt(16); o.writeInt(2)
    str(0x40009, "z"); str(0x40009, "i")
    o.writeInt(0x402); o.writeInt(1); str(0x40009, "class")
    o.writeInt(16); o.writeInt(1); str(0x40009, "data.frame")
    o.writeInt(0xfe)
    o.writeInt(0xfe)
    o.flush()
    bos.toByteArray
  }

  test("parses a CPLXSXP column to struct<re,im>, NA part nulls the cell") {
    val df = Rda.readRda(spark, writeTmp(buildComplexRda()))("df")
    assert(df.columns.toSeq == Seq("z", "i"))
    assert(df.schema("z").dataType.simpleString == "struct<re:double,im:double>")
    val rows = df.orderBy("i").collect()
    assert(rows.length == 3)
    val z1 = rows(0).getStruct(0)
    assert(z1.getDouble(0) == 1.5 && z1.getDouble(1) == 2.5)
    assert(rows(1).isNullAt(0)) // NA real part → whole cell null
    val z3 = rows(2).getStruct(0)
    assert(z3.getDouble(0) == -3.0 && z3.getDouble(1) == 0.0)
    // complex arithmetic downstream is ordinary struct-field math
    val sums = df.filter("z IS NOT NULL")
      .selectExpr("round(sum(z.re), 6) AS sre", "round(sum(z.im), 6) AS sim")
      .head()
    assert(sums.getDouble(0) == -1.5 && sums.getDouble(1) == 2.5)
  }

  // Reference-generated fixtures (R scripts in the reference's RDA
  // test): behavior parity with the reference's expected frames.
  private val refDir = "/root/reference/test/data/RDA"

  test("reads the reference minimal.rda: num = [1.1, 2.2]") {
    assume(new java.io.File(s"$refDir/minimal.rda").exists())
    val df = Rda.readRda(spark, s"$refDir/minimal.rda")("df")
    assert(df.columns.toSeq == Seq("num"))
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.1, 2.2))
  }

  test("reads the reference types.rda: num/int/logi/chr/factor") {
    assume(new java.io.File(s"$refDir/types.rda").exists())
    val df = Rda.readRda(spark, s"$refDir/types.rda")("df")
    assert(df.columns.toSeq == Seq("num", "int", "logi", "chr", "factor"))
    val rows = df.orderBy("int").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.1, 2.2))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(true, false))
    assert(rows.map(_.getString(3)).toSeq == Seq("ab", "c"))
    // factor decoded to its level strings
    assert(rows.map(_.getString(4)).toSeq == Seq("ab", "c"))
  }

  test("reads the reference NAs.rda: full-NA second row") {
    assume(new java.io.File(s"$refDir/NAs.rda").exists())
    val df = Rda.readRda(spark, s"$refDir/NAs.rda")("df")
    assert(df.columns.toSeq == Seq("num", "int", "logi", "factor"))
    assert(df.count() == 2)
    val na = df.filter("num IS NULL").collect()
    assert(na.length == 1 && (1 until 4).forall(na.head.isNullAt))
    val ok = df.filter("num IS NOT NULL").head()
    assert(ok.getDouble(0) == 1.1 && ok.getInt(1) == 1 &&
      ok.getBoolean(2) && ok.getString(3) == "ab")
  }
}
