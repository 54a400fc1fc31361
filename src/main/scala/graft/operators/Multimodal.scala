package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 #32): treat media as opaque
  * `binary` columns + typed metadata, with decode/feature-extract as
  * distributed per-partition kernels.
  *
  * Header PARSING is real byte arithmetic — PNG / GIF / BMP carry
  * their dimensions at fixed offsets (big- and little-endian), and
  * the typed kernel additionally walks JPEG segment markers to SOF.
  * Only pixel DECODE would need a codec library (absent in this
  * container), so payloads are synthesized: the corpus has no image
  * bytes, and [[binaryMeta]] deterministically wraps each document's
  * text in a real PNG/GIF/BMP header (dimensions derived from
  * doc_id) before parsing it back. Both construction and parse are
  * pure byte algebra any engine replays — the oracle builds and
  * parses the identical bytes in DuckDB.
  */
object Multimodal {

  /** A "media file" row: opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features (the header-parse output schema). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                             width: Long, height: Long, channels: Long)

  /** Deterministic synthetic payload: doc_id picks the container
    * (mod 3: PNG, GIF89a, BMP), dimensions are doc_id-derived, text
    * bytes follow the header as the "pixel data". Emitted as a real
    * `binary` column via unhex so everything downstream exercises
    * binary plumbing, not strings.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    def byteHexLe(c: Column, nBytes: Int): Column =
      concat((0 until nBytes).map(k =>
        lpad(hex(shiftright(c, 8 * k) % 256), 2, "0")): _*)
    val w = (col("doc_id") % 1000 + 1).cast("long")
    val h = (col("doc_id") % 777 + 1).cast("long")
    val png = concat(
      lit("89504E470D0A1A0A"), // magic
      lit("0000000D49484452"), // IHDR length 13 + "IHDR"
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), // big-endian u32 dims
      lit("0802000000")) // bit depth 8, color type 2 (truecolor), c/f/i
    val gif = concat(
      lit("474946383961"), // "GIF89a"
      byteHexLe(w, 2), byteHexLe(h, 2)) // little-endian u16 dims
    val bmp = concat(
      lit("424D"), lit("0" * 24), // "BM", size/reserved/offset zeroed
      lit("28000000"), // BITMAPINFOHEADER size 40
      byteHexLe(w, 4), byteHexLe(h, 4)) // little-endian i32 dims
    val headerHex = when(col("doc_id") % 3 === 0, png)
      .when(col("doc_id") % 3 === 1, gif)
      .otherwise(bmp)
    documents.select(col("doc_id"),
      unhex(concat(headerHex, hex(col("text")))).as("payload"))
  }

  /** Parse container magic + dimensions from the byte layout — pure
    * Column algebra over hex(payload): byte k of the payload is hex
    * chars [2k−1, 2k], big-endian fields read left-to-right,
    * little-endian fields reverse byte pairs. No codec, no UDF; the
    * whole parse stays inside whole-stage codegen.
    *
    * Offsets (1-based bytes): PNG w/h = u32be @17/@21, color type
    * @26 (→ channels 0→1, 2→3, 4→2, 6→4); GIF w/h = u16le @7/@9
    * (palette → 3 channels); BMP w/h = i32le @19/@23 (synthesized
    * 24bpp → 3). Digest is md5 of the hex (DuckDB's md5 is
    * VARCHAR-only, so the oracle-parity digest hashes the hex form).
    */
  def binaryMeta(documents: DataFrame): DataFrame = {
    val media = synthesize(documents)
    val hx = hex(col("payload"))
    def be(startByte: Int, nBytes: Int): Column =
      conv(substring(hx, (startByte - 1) * 2 + 1, nBytes * 2), 16, 10).cast("long")
    def le(startByte: Int, nBytes: Int): Column =
      conv(concat(((nBytes - 1) to 0 by -1).map(k =>
        substring(hx, (startByte - 1 + k) * 2 + 1, 2)): _*), 16, 10).cast("long")
    val isPng = substring(hx, 1, 16) === "89504E470D0A1A0A"
    val isGif = substring(hx, 1, 12).isin("474946383761", "474946383961")
    val isBmp = substring(hx, 1, 4) === "424D"
    media.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(hx).as("digest"),
        when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
          .otherwise("unknown").as("format"),
        when(isPng, be(17, 4)).when(isGif, le(7, 2)).when(isBmp, le(19, 4)).as("width"),
        when(isPng, be(21, 4)).when(isGif, le(9, 2)).when(isBmp, le(23, 4)).as("height"),
        when(isPng, // color type → sample count
          when(be(26, 1) === 0, 1L).when(be(26, 1) === 2, 3L)
            .when(be(26, 1) === 4, 2L).when(be(26, 1) === 6, 4L))
          .when(isGif, 3L).when(isBmp, 3L).as("channels"))
      .withColumn("n_pixels", (col("width") * col("height")).cast("long"))
      .orderBy(col("doc_id"))
  }

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
    * kernel → typed rows. [[parseHeader]] is a REAL byte-level
    * header parser (PNG/GIF/BMP fixed offsets plus the JPEG marker
    * walk the Column-algebra path can't express); only pixel decode
    * remains out of scope without a codec. Partitioning, iterator
    * streaming, encoders, and schema are production-shaped.
    */
  def decodePipeline(documents: DataFrame): Dataset[MediaMeta] = {
    val spark = documents.sparkSession
    import spark.implicits._
    synthesize(documents).as[MediaRow]
      .mapPartitions { rows => rows.map(m => parseHeader(m.doc_id, m.payload)) }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3))
  private def le16(b: Array[Byte], i: Int): Long = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  /** Byte-level header parse: PNG, GIF, BMP at fixed offsets, JPEG
    * via the segment-marker walk (FF xx + big-endian length) to the
    * first SOF0-SOF15 frame header, which carries height u16be @+5,
    * width @+7, components @+9 — exactly how `identify`-style tools
    * read dimensions without decoding.
    */
  def parseHeader(docId: Long, b: Array[Byte]): MediaMeta = {
    def meta(fmt: String, w: Long, h: Long, c: Long) =
      MediaMeta(docId, b.length.toLong, fmt, w, h, c)
    if (b.length >= 26 && be32(b, 0) == 0x89504e47L && be32(b, 4) == 0x0d0a1a0aL) {
      val channels = u8(b, 25) match {
        case 0 => 1L; case 2 => 3L; case 4 => 2L; case 6 => 4L; case _ => 0L
      }
      meta("png", be32(b, 16), be32(b, 20), channels)
    } else if (b.length >= 10 &&
        (b.startsWith("GIF87a".getBytes) || b.startsWith("GIF89a".getBytes))) {
      meta("gif", le16(b, 6), le16(b, 8), 3L)
    } else if (b.length >= 26 && u8(b, 0) == 'B' && u8(b, 1) == 'M') {
      meta("bmp", le32(b, 18), le32(b, 22), 3L)
    } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) {
      // JPEG: walk FF-marker segments to the first SOFn (C0-CF minus
      // the non-frame C4/C8/CC); each non-entropy segment is
      // FF marker len_hi len_lo payload(len-2). Real-world encoders
      // may pad BETWEEN segments with extra FF fill bytes (the spec
      // allows any number before a marker), and TEM (0x01) / RSTn /
      // SOI / EOI are standalone markers with no length field — both
      // must be skipped without reading a bogus length. The SOF
      // payload is precision(1) height(u16be) width(u16be)
      // components(1).
      def be16(i: Int): Long = ((u8(b, i) << 8) | u8(b, i + 1)).toLong
      var i = 2
      var out: MediaMeta = null
      var halted = false
      while (out == null && !halted && i < b.length && u8(b, i) == 0xff) {
        var m = i + 1
        while (m < b.length && u8(b, m) == 0xff) m += 1 // FF fill bytes
        if (m >= b.length) halted = true
        else {
          val marker = u8(b, m)
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            out =
              if (m + 8 < b.length)
                meta("jpeg", be16(m + 6), be16(m + 4), u8(b, m + 8).toLong)
              else meta("jpeg", 0L, 0L, 0L)
          } else if (marker == 0x01 || marker == 0x00 ||
              (marker >= 0xd0 && marker <= 0xd9)) {
            i = m + 1 // standalone: TEM / stuffed 00 / RSTn / SOI / EOI
          } else if (m + 2 < b.length) {
            i = m + 1 + ((u8(b, m + 1) << 8) | u8(b, m + 2))
          } else halted = true
        }
      }
      if (out != null) out else meta("jpeg", 0L, 0L, 0L)
    } else meta("unknown", 0L, 0L, 0L)
  }
}
