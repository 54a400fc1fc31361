package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 #32): treat media as opaque
  * `binary` columns + typed metadata, with decode/feature-extract as
  * distributed per-partition kernels.
  *
  * The decode kernel itself is STUBBED deterministically (no codec
  * libraries in this container) — what's real and tested is the
  * Spark-side shape: binary columns flowing through a scan, a typed
  * `mapPartitions` over an `Encoder`-backed batch iterator (the
  * Scala analog of `mapInPandas`: one kernel invocation per
  * partition, streaming rows, no driver collect), and a stable
  * output schema for downstream SQL.
  */
object Multimodal {

  /** A "media file" row: opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features (the decode-stub output schema). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
                             width: Long, height: Long, channels: Long)

  /** Column-algebra metadata extraction — the oracle-checkable query:
    * byte size, content digest, and a deterministic fake "header
    * decode" (first two byte values as width/height, size mod 4 + 1
    * as channels). Mirrors what a real header parse would produce,
    * with arithmetic any engine can replay.
    */
  def binaryMeta(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("width"),
        ascii(substring(col("text"), 2, 1)).cast("long").as("height"),
        (length(col("payload")) % 4 + 1).cast("long").as("channels"))
      .withColumn("n_pixels", (col("width") * col("height")).cast("long"))
      .orderBy(col("doc_id"))

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size frames (a stand-in for video GOP/frame boundaries),
    * keep every Nth, emit per-frame metadata. Pure Column algebra —
    * `sequence`+`transform`+`posexplode` — so the fan-out happens
    * executor-side at scan speed with no UDF; the frame list is never
    * materialized per row beyond the generator.
    */
  def frameSample(documents: DataFrame, frameBytes: Int = 16, everyN: Int = 4): DataFrame = {
    val n = length(col("text"))
    // (n-1)/frameBytes is DOUBLE division; for n=0 it truncates to 0
    // and sequence(0,0) would fabricate one empty frame (and the
    // oracle's floor division would not). Count frames with integer
    // arithmetic and guard empty payloads to an empty array.
    val nFrames = ((n + (frameBytes - 1)).cast("long") / frameBytes).cast("int")
    val frames = when(n > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => col("text").substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<string>"))
    documents
      .select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_chars"),
        md5(col("frame")).as("digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The distributed decode pipeline: binary batches → per-partition
    * kernel → typed rows. `decodeStub` stands in for an image/audio
    * codec; everything around it (partitioning, iterator streaming,
    * encoders, schema) is production-shaped. Covered by ScalaTest
    * against [[binaryMeta]].
    */
  def decodePipeline(documents: DataFrame): Dataset[MediaMeta] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows => rows.map(decodeStub) }
  }

  /** Deterministic fake decoder — replace with a real codec call
    * when the runtime ships one. The "header decode" must match
    * [[binaryMeta]]'s `ascii(substring(text, n, 1))` exactly, and
    * `ascii` is CODEPOINT-based — so decode the payload as UTF-8 and
    * take the first two characters' code points (raw header BYTES
    * would diverge on any document starting with a non-ASCII char,
    * e.g. the zh corpus).
    */
  private def decodeStub(m: MediaRow): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(m.payload).map("%02x".format(_)).mkString
    val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
    val cp0 = if (text.isEmpty) 0L else text.codePointAt(0).toLong
    val off1 = if (text.isEmpty) 0 else Character.charCount(text.codePointAt(0))
    val cp1 = if (text.length > off1) text.codePointAt(off1).toLong else 0L
    MediaMeta(
      doc_id = m.doc_id,
      n_bytes = m.payload.length.toLong,
      digest = digest,
      width = cp0,
      height = cp1,
      channels = m.payload.length.toLong % 4 + 1)
  }
}
