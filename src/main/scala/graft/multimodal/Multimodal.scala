package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}

/** One media record: opaque binary payload + typed metadata. The layout
  * a 100 TB multimodal lakehouse uses: parquet binary column (chunked,
  * dictionary-off), small typed metadata columns for pruning.
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                             mime: String, n_bytes: Long)

/** Extracted features (what a real decoder would emit). */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                               width: Int, height: Int)

/** Multimodal-column plumbing. The container ships no image/audio codecs
  * (builder contract), so the decode kernel is a clearly-marked
  * deterministic STUB — but everything Spark-side is real: binary
  * schema, typed Dataset boundary, partition-batch iteration, and the
  * pruning metadata layout.
  */
object Multimodal {

  /** Wrap a text table as binary media records (stand-in for reading an
    * image/audio parquet: `binary` payload + metadata). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      F.col("doc_id"),
      F.expr("encode(text, 'UTF-8')").as("payload"),
      F.lit("text/plain").as("mime"),
      F.expr("octet_length(encode(text, 'UTF-8'))").cast("long").as("n_bytes"))

  /** STUB decode kernel.
    *
    * Real implementation would decode payloads with an image library in
    * batch (the `mapPartitions` boundary is exactly where that batch
    * call goes — one codec init per partition, not per row). Here the
    * "decode" derives deterministic pseudo-features from the bytes so
    * the plumbing is testable end-to-end without codecs.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec init" would happen here
      it.map { r =>
        val cs = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        MediaFeatures(r.doc_id, r.payload.length.toLong, cs,
          width = 64 + (cs % 512).toInt, height = 64 + ((cs / 512) % 512).toInt)
      }
    }
  }

  /** End-to-end: documents → media records → stub decode → features. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeStub(asMedia(docs).as[MediaRecord]).toDF()
  }

  /** STUB resize kernel: a real implementation hands each batch to an
    * image library; the deterministic fake rescales the payload by
    * byte-sampling to `targetBytes`. Payload-in/payload-out shape,
    * per-partition batching — the plumbing a real resize uses.
    */
  def resizeStub(media: Dataset[MediaRecord],
                 targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val src = r.payload
        val out =
          if (src.length <= targetBytes) src
          else Array.tabulate(targetBytes)(i =>
            src((i.toLong * src.length / targetBytes).toInt))
        r.copy(payload = out, n_bytes = out.length.toLong)
      }
    }
  }

  /** STUB frame sampler: treats the payload as a "video" and emits one
    * record per sampled frame — the ONE-TO-MANY boundary (flatMap) that
    * real frame extraction needs; each frame is a deterministic slice.
    * Output: (doc_id, frame_idx, frame_bytes, checksum).
    */
  def frameSampleStub(media: Dataset[MediaRecord],
                      nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      val frameLen = math.max(1, len / math.max(nFrames, 1))
      (0 until math.min(nFrames, len)).map { f =>
        val start = (f.toLong * len / nFrames).toInt
        val slice = r.payload.slice(start,
          math.min(start + frameLen, len))
        val cs = slice.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        (r.doc_id, f, slice.length, cs)
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "checksum")
  }
}
